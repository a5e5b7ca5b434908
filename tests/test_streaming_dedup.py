"""streaming_dedup_exact: streamed dedup must equal batch dropDuplicates."""

from __future__ import annotations

import pyspark.sql.functions as F

from artan_spark.sources import read_table
from artan_spark.streaming import stream_transform, streaming_dedup_exact

from conftest import SF_DIR


def test_streaming_dedup_matches_batch(spark):
    d = read_table(spark, SF_DIR, "documents")
    # duplicate every doc, jitter one copy's id so only `text` collides.
    # Expected counts derive from the data (never fixture-size constants:
    # the driver regenerates sf0.001 and pins break — r9 verdict).
    n_distinct_texts = d.select("text").distinct().count()
    assert n_distinct_texts >= 10  # corpus sanity, any regeneration size
    dup = d.withColumn("doc_id", F.col("doc_id") + 100000)
    both = d.unionByName(dup).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )

    batch = streaming_dedup_exact(both, text_col="text", event_time_col="ts")
    streamed = stream_transform(
        spark,
        both,
        lambda df: streaming_dedup_exact(df, text_col="text", event_time_col="ts"),
        chunk_rows=11,
    )
    n_batch, n_stream = batch.count(), streamed.count()
    assert n_batch == n_distinct_texts  # every duplicate collapsed
    assert n_stream == n_batch
    # same surviving text set
    a = {r["text"] for r in batch.select("text").collect()}
    b = {r["text"] for r in streamed.select("text").collect()}
    assert a == b


def test_streaming_decontamination_stream_static_join(spark):
    """Live-ingest eval decontamination: streaming documents joined against
    a STATIC train-split shingle index (a stream-static equi-join — no
    state, the index is just a table Spark re-reads per micro-batch). The
    streamed flags must equal the batch docs_decontaminate report."""
    from artan_spark.plans.dedup import _shingles
    from artan_spark.plans.sampling import _TRAIN, _VAL, _hash_bucket

    sf = SF_DIR
    sh = _shingles(spark, sf)
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN, F.lit("train")).when(b < _VAL, F.lit("val")).otherwise(F.lit("test"))
    )
    tagged = sh.withColumn("split", split)
    train_index = (
        tagged.filter(F.col("split") == "train")
        .select(F.col("doc_id").alias("train_doc_id"), "shingle")
        .localCheckpoint()  # the static side: built once, joined per batch
    )
    test_docs = (
        read_table(spark, sf, "documents")
        .withColumn("split", split)
        .filter(F.col("split") == "test")
        .select("doc_id", "text")
    )

    from artan_spark.plans.sampling import docs_decontaminate

    want = {
        r.test_doc_id: (r.n_shared_shingles, r.n_train_docs_hit)
        for r in docs_decontaminate(spark, sf).collect()
    }

    # the streaming piece is the stateless stream-static JOIN (shingle
    # explode + equi-join against the static index, one pass per
    # micro-batch); the final count aggregate runs on the materialized
    # join output, where append mode would otherwise hold rows back
    from artan_spark.plans.dedup import shingles_of

    # shingles_of is the SHARED shingle definition (stateless projections —
    # no streaming dedup state; the countDistinct aggregates below absorb
    # duplicate (doc, shingle) join rows), so the streamed side cannot
    # drift from the batch report's shingling. distinct() is dropped on the
    # stream: it would compile to an unwatermarked stateful dedup.
    joined_stream = stream_transform(
        spark,
        test_docs,
        lambda df: shingles_of(df.select("doc_id", "text")).join(train_index, "shingle"),
        chunk_rows=17,
    )
    got = {
        r.test_doc_id: (r.n_shared_shingles, r.n_train_docs_hit)
        for r in joined_stream.groupBy(F.col("doc_id").alias("test_doc_id"))
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("train_doc_id").alias("n_train_docs_hit"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_streaming_bloom_dedup_exact_regime(spark):
    """With a generously sized filter no false positive fires, so the
    emitted set equals the exact distinct set under any chunking, equals
    the one-fold batch call, and contains no duplicates."""
    from pyspark.sql import functions as F

    from artan_spark.streaming import stream_transform
    from artan_spark.streaming.dedup import StreamingBloomDedup
    from artan_spark.sources import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        F.lit("all").alias("grp"), F.col("user_id").cast("string").alias("item")
    )
    op = StreamingBloomDedup().setStateKeyCol("grp").setItemCol("item").setNBits(1 << 18)

    truth = {r.item for r in ev.select("item").distinct().collect()}
    batch = [r.item for r in op.transform(ev).collect()]
    assert len(batch) == len(set(batch)) == len(truth)

    streamed = [r.item for r in stream_transform(spark, ev, op.transform, chunk_rows=173).collect()]
    assert len(streamed) == len(set(streamed))
    assert set(streamed) == truth


def test_streaming_bloom_dedup_tiny_filter_suppresses_but_never_duplicates(spark):
    """A deliberately tiny filter (128 bits for 500 distinct items) MUST
    suppress some novel items (false positives) — but still never emits
    the same item twice, and everything it emits is a real item."""
    from artan_spark.streaming import stream_transform
    from artan_spark.streaming.dedup import StreamingBloomDedup

    rows = [("all", f"item-{i % 500:03d}") for i in range(1500)]
    ev = spark.createDataFrame(rows, "grp string, item string")
    op = StreamingBloomDedup().setStateKeyCol("grp").setItemCol("item").setNBits(128).setNHashes(2)
    truth = {r.item for r in ev.select("item").distinct().collect()}
    streamed = [r.item for r in stream_transform(spark, ev, op.transform, chunk_rows=173).collect()]
    assert len(streamed) == len(set(streamed))
    assert set(streamed) <= truth
    assert len(streamed) < len(truth)  # saturated filter must have suppressed


def test_streaming_url_dedup_matches_batch(spark):
    """Stage-1 URL dedup on a live stream: canonicalize in the stream
    (stateless Catalyst projection) and key streaming_dedup_exact on the
    canonical URL. Streamed survivors = one row per canonical page = the
    batch docs_url_dedup groups."""
    from artan_spark.plans.urls import canonical_url, with_synthetic_url
    from artan_spark.plans.urls import docs_url_dedup

    d = with_synthetic_url(
        read_table(spark, SF_DIR, "documents").select("doc_id", "source")
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))

    def t(df):
        return streaming_dedup_exact(
            df.withColumn("canonical_url", canonical_url(F.col("url"))),
            keys=["canonical_url"],
            event_time_col="ts",
        )

    streamed = stream_transform(spark, d, t, chunk_rows=17)
    want = {r["canonical_url"]: r for r in docs_url_dedup(spark, SF_DIR).collect()}
    got = streamed.select("canonical_url", "doc_id").collect()
    assert len(got) == len(want)  # one survivor per canonical page
    assert {r["canonical_url"] for r in got} == set(want)
    # every survivor belongs to its page's duplicate group: the synthetic
    # derivation groups docs by page = doc_id // 4 (within one source)
    for r in got:
        assert r["doc_id"] // 4 == want[r["canonical_url"]]["keep_doc_id"] // 4
