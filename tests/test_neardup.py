"""Streaming MinHash near-dup filter: the incremental operators must
reproduce the batch window formulation (which is itself DuckDB-oracled via
plans.PYTEST_ORACLES['docs_minhash_dedup_flags'])."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from artan_spark.plans.dedup import docs_minhash_dedup_flags
from artan_spark.sources import read_table
from artan_spark.streaming import stream_transform
from artan_spark.streaming.neardup import (
    BandVote,
    BucketFirstSeen,
    minhash_bands,
    streaming_near_dup,
)

from conftest import SF_DIR


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("doc_id").reset_index(drop=True)


def test_batch_composition_matches_window_formulation(spark):
    want = _norm(docs_minhash_dedup_flags(spark, SF_DIR).toPandas())
    got = _norm(streaming_near_dup(read_table(spark, SF_DIR, "documents")).toPandas())
    pd.testing.assert_frame_equal(got, want)
    assert got["is_dup"].sum() > 0  # the corpus has real near-dups


def test_streamed_stagewise_replay_matches_batch(spark):
    """Replay each stateful stage as a stream (docs fed in doc_id order,
    several per micro-batch) and compare the final flags to the batch
    window formulation."""
    docs = read_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 120)
    bands = (
        minhash_bands(docs)
        .withColumn("bucket", F.concat_ws(":", F.col("band").cast("string"), "sig"))
        .orderBy("doc_id", "band")
    )
    op1 = BucketFirstSeen().setStateKeyCol("bucket")
    owners = stream_transform(spark, bands, op1.transform, chunk_rows=16)
    votes_in = owners.select(F.col("doc_id"), "owner").orderBy("doc_id")
    op2 = BandVote().setStateKeyCol("doc_id")
    flags = stream_transform(spark, votes_in, op2.transform, chunk_rows=16).select(
        F.col("stateKey").cast("long").alias("doc_id"), "is_dup", "dup_of"
    )
    got = _norm(flags.toPandas())

    sub_flags = docs_minhash_dedup_flags(spark, SF_DIR)
    want = _norm(sub_flags.filter(F.col("doc_id") < 120).toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_short_docs_emit_no_bands(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "three words here now"), (3, "")],
        "doc_id long, text string",
    )
    out = streaming_near_dup(docs).toPandas()
    assert sorted(out["doc_id"]) == [2]  # <3-token docs excluded


def test_band_vote_emits_once_under_replay(spark):
    """At-least-once replay: duplicate band rows arriving AFTER the doc's
    flag was emitted must not re-emit it — the emission is edge-triggered
    (prev < n_bands <= now), not a level check on the running count."""
    rows = [(1, 5 if i < 2 else None) for i in range(6)]  # 4 real bands + 2 replayed
    votes_in = spark.createDataFrame(rows, "doc_id long, owner long")
    flags = stream_transform(
        spark,
        votes_in,
        BandVote().setStateKeyCol("doc_id").transform,
        chunk_rows=4,  # batch 1: all 4 bands (emits); batch 2: 2 replayed rows
    ).toPandas()
    assert len(flags) == 1
    assert bool(flags["is_dup"].iloc[0]) and int(flags["dup_of"].iloc[0]) == 5


def test_bucket_state_expires_past_horizon(spark):
    """With event_time + horizon, a bucket idle past the watermark horizon
    is evicted: a near-duplicate arriving later is treated as fresh
    (bounded state on unbounded streams); without a horizon it is flagged."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, "warmup words completely unrelated to anything else", t0),
        (2, dup_text, t0 + dt.timedelta(hours=1)),
        (3, "another unrelated document with different words entirely", t0 + dt.timedelta(hours=3)),
        (4, dup_text, t0 + dt.timedelta(hours=3, minutes=30)),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string, ts timestamp")

    def run(horizon):
        bands = minhash_bands(ddf, event_time_col="ts").withColumn(
            "bucket", F.concat_ws(":", F.col("band").cast("string"), "sig")
        ).orderBy("ts", "doc_id", "band")
        op1 = BucketFirstSeen().setStateKeyCol("bucket")
        if horizon:
            op1 = (
                op1.setEventTimeCol("ts")
                .setWatermarkDuration(horizon)
                .setStateTimeoutMode("event")
            )
        owners = stream_transform(spark, bands, op1.transform, chunk_rows=4)
        flags = BandVote().setStateKeyCol("doc_id").transform(
            owners.select(F.col("doc_id"), "owner")
        )
        return {
            int(r["stateKey"]): (r["is_dup"], r["dup_of"]) for r in flags.collect()
        }

    full = run(None)
    assert full[4] == (True, 2)  # full history: doc 4 is a near-dup of doc 2

    bounded = run("1 hour")
    assert bounded[4] == (False, None)  # bucket for doc 2 expired before doc 4
    assert bounded[2] == (False, None)

    # the horizon is exact in event time: with a horizon that still covers
    # the 2h30 gap, the duplicate IS flagged even though other traffic
    # advanced the watermark in between (the old wm+1 timer evicted on any
    # watermark advance during key silence — a within-horizon recall hole)
    within = run("3 hours")
    assert within[4] == (True, 2)


def test_neardup_operator_persistence_roundtrip(tmp_path):
    from artan_spark.operators import StreamingAsofJoin

    op1 = (
        BucketFirstSeen()
        .setStateKeyCol("bucket")
        .setEventTimeCol("ts")
        .setWatermarkDuration("2 hours")
        .setStateTimeoutMode("event")
    )
    op1.save(str(tmp_path / "b"))
    l1 = BucketFirstSeen.load(str(tmp_path / "b"))
    for k in ("stateKeyCol", "eventTimeCol", "watermarkDuration", "stateTimeoutMode"):
        assert l1.get(k) == op1.get(k)

    op2 = BandVote().setStateKeyCol("doc_id").setNBands(6)
    op2.save(str(tmp_path / "v"))
    assert BandVote.load(str(tmp_path / "v")).get("nBands") == 6

    op3 = StreamingAsofJoin().setStateKeyCol("k").setSideCol("s").setPayloadCol("p")
    op3.save(str(tmp_path / "a"))
    l3 = StreamingAsofJoin.load(str(tmp_path / "a"))
    assert (l3.get("sideCol"), l3.get("payloadCol")) == ("s", "p")


def test_streamed_replay_matches_batch_on_driver_data_sf001(spark):
    """Streamed replay == batch on the DRIVER's sf0.01 documents table —
    the same corpus the docs_minhash_dedup_flags DuckDB oracle runs on, so
    the batch anchor and the stream agree on driver data, not just on
    synthetic frames. Full corpus, both stateful stages replayed."""
    sf = "/root/testdata/sf0.01"
    docs = read_table(spark, sf, "documents")
    bands = (
        minhash_bands(docs)
        .withColumn("bucket", F.concat_ws(":", F.col("band").cast("string"), "sig"))
        .orderBy("doc_id", "band")
    )
    op1 = BucketFirstSeen().setStateKeyCol("bucket")
    owners = stream_transform(spark, bands, op1.transform, chunk_rows=256)
    votes_in = owners.select(F.col("doc_id"), "owner").orderBy("doc_id")
    op2 = BandVote().setStateKeyCol("doc_id")
    flags = stream_transform(spark, votes_in, op2.transform, chunk_rows=256).select(
        F.col("stateKey").cast("long").alias("doc_id"), "is_dup", "dup_of"
    )
    got = _norm(flags.toPandas())

    want = _norm(docs_minhash_dedup_flags(spark, sf).toPandas())
    pd.testing.assert_frame_equal(got, want)
    assert got["is_dup"].sum() > 0
