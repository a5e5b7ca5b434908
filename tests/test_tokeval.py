"""Tokenizer comparison report: every row derives from the SAME per-doc
encoder outputs the replay-pinned operators emit — recomputed here by
plain-Python aggregation over the collected encodes."""

from pyspark.sql import functions as F

from artan_spark.plans.tokeval import docs_tokenizer_eval, tokenizer_eval
from artan_spark.sources import read_table_wide

from conftest import SF_DIR


def test_rows_derive_from_encoder_outputs(spark):
    from artan_spark.plans.bpe import bpe_encode_ids, bpe_train, bpe_vocab

    d = read_table_wide(spark, SF_DIR, "documents").select("doc_id", "text")
    merges = bpe_train(d)
    vocab = bpe_vocab(d, merges)
    report = {r.family: r for r in tokenizer_eval(d, merges=merges).collect()}
    assert set(report) == {"bpe", "unigram", "wordpiece"}

    # plain-Python recompute of the bpe row from the per-doc encodes
    encs = bpe_encode_ids(d, merges, vocab).collect()
    texts = {r.doc_id: r.text for r in d.collect()}
    total = sum(r.n_tokens for r in encs)
    unks = sum(sum(1 for i in r.ids if i == 0) for r in encs)
    n_words = sum(len(t.strip().split()) if t and t.strip() else 1 for t in texts.values())
    n_bytes = sum(len(t) for t in texts.values())
    row = report["bpe"]
    assert row.vocab_size == len(vocab)
    assert row.total_tokens == total
    assert row.fertility == round(total / n_words, 6)
    assert row.bytes_per_token == round(n_bytes / total, 6)
    assert row.unk_rate == round(unks / total, 6)

    # sanity across families: same corpus, so denominators agree and every
    # fertility >= 1 (a word is at least one token in all three)
    for r in report.values():
        assert r.fertility >= 1.0
        assert r.total_tokens > 0


def test_driver_entry_runs(spark):
    out = docs_tokenizer_eval(spark, SF_DIR)
    assert out.count() == 3
