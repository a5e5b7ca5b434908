"""streaming_dedup_exact: streamed dedup must equal batch dropDuplicates."""

from __future__ import annotations

import pyspark.sql.functions as F

from artan_spark.sources import read_table
from artan_spark.streaming import stream_transform, streaming_dedup_exact

from conftest import SF_DIR


def test_streaming_dedup_matches_batch(spark):
    d = read_table(spark, SF_DIR, "documents").limit(60)
    # duplicate every doc, jitter one copy's id so only `text` collides
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
    assert n_batch == 60  # every duplicate collapsed
    assert n_stream == n_batch
    # same surviving text set
    a = {r["text"] for r in batch.select("text").collect()}
    b = {r["text"] for r in streamed.select("text").collect()}
    assert a == b
