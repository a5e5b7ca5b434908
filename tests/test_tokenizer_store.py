"""Tokenizer persistence: exact round-trips per family, encode equality
under the loaded model, unknown-kind rejection."""

import pytest

from artan_spark.plans.tokenizer_store import load_tokenizer, save_tokenizer

CORPUS = [
    (0, "hugs hug hugging pug pugs bug bugs"),
    (1, "hug hug hugs pun puns fun"),
    (2, "bun buns pun hugging hugging"),
]


def test_bpe_roundtrip_and_encode(spark, tmp_path):
    import pyspark.sql.functions as F

    from artan_spark.plans.bpe import bpe_encode_ids, bpe_train, bpe_vocab

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10)
    save_tokenizer(spark, str(tmp_path / "bpe"), "bpe", merges)
    kind, loaded = load_tokenizer(spark, str(tmp_path / "bpe"))
    assert kind == "bpe" and loaded == merges  # exact, order included

    vocab = bpe_vocab(docs, merges)
    a = bpe_encode_ids(docs, merges, vocab).orderBy("doc_id").collect()
    b = bpe_encode_ids(docs, loaded, bpe_vocab(docs, loaded)).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_unigram_roundtrip_and_encode(spark, tmp_path):
    from artan_spark.plans.unigram import unigram_encode_ids, unigram_train

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    logp = unigram_train(docs, vocab_size=40)
    save_tokenizer(spark, str(tmp_path / "uni"), "unigram", logp)
    kind, loaded = load_tokenizer(spark, str(tmp_path / "uni"))
    assert kind == "unigram" and loaded == logp  # float bits included

    a = unigram_encode_ids(docs, logp).orderBy("doc_id").collect()
    b = unigram_encode_ids(docs, loaded).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_wordpiece_roundtrip_and_encode(spark, tmp_path):
    from artan_spark.plans.wordpiece import wordpiece_encode_ids, wordpiece_train

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    pieces = wordpiece_train(docs, n_merges=10)
    save_tokenizer(spark, str(tmp_path / "wp"), "wordpiece", pieces)
    kind, loaded = load_tokenizer(spark, str(tmp_path / "wp"))
    assert kind == "wordpiece" and loaded == pieces

    a = wordpiece_encode_ids(docs, pieces).orderBy("doc_id").collect()
    b = wordpiece_encode_ids(docs, loaded).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_unknown_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown tokenizer kind"):
        save_tokenizer(spark, str(tmp_path / "x"), "sentencepiece9000", [])
