"""Tokenizer serving on a stream: the encode path of all three trained
tokenizer families is a stateless Arrow mapInPandas projection, so a saved
vocabulary must encode a replayed document stream to the exact ids the
batch path produces, at any chunking — the daily-ingest serving contract
(encode new docs under the FROZEN vocabulary)."""

from pyspark.sql import functions as F

from artan_spark.plans.tokenizer_store import load_tokenizer, save_tokenizer
from artan_spark.plans.unigram import unigram_encode_ids, unigram_train
from artan_spark.sources import read_table_wide
from artan_spark.streaming.harness import stream_transform

SF_DIR = "/root/testdata/sf0.001"


def test_stream_encode_equals_batch_under_loaded_vocab(spark, tmp_path):
    docs = (
        read_table_wide(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(60)
        .localCheckpoint()
    )
    model = unigram_train(docs, vocab_size=64, max_train_words=512)
    save_tokenizer(spark, str(tmp_path / "tok"), "unigram", model)
    kind, logp = load_tokenizer(spark, str(tmp_path / "tok"))
    assert kind == "unigram"

    batch = {r["doc_id"]: (list(r["ids"]), r["n_tokens"])
             for r in unigram_encode_ids(docs, logp).collect()}
    streamed_df = stream_transform(
        spark, docs, lambda s: unigram_encode_ids(s, logp), chunk_rows=20
    )
    streamed = {r["doc_id"]: (list(r["ids"]), r["n_tokens"]) for r in streamed_df.collect()}
    assert streamed == batch
    assert len(batch) == 60
