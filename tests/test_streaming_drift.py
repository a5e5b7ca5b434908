"""Streaming PSI monitor: every emitted (window, key) row must equal the
batch scorer on exactly that window's input slice; chunking must be
invisible; windows still open at stream end must not emit."""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.temporal import persist_psi_reference, score_against_psi_reference
from artan_spark.sources import read_table
from artan_spark.streaming.drift import streaming_psi
from artan_spark.streaming.harness import stream_transform

SF_DIR = "/root/testdata/sf0.001"
WINDOW = "7 days"


@pytest.fixture(scope="module")
def psi_store(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("drift") / "psi")
    ref = (
        read_table(spark, SF_DIR, "events")
        .filter(F.dayofmonth("ts") <= 15)
        .select("event_type", "value")
    )
    persist_psi_reference(ref, store, "event_type", "value")
    return store


def test_streaming_psi_matches_batch_per_window(spark, psi_store):
    e = (
        read_table(spark, SF_DIR, "events")
        .select("event_type", "ts", "value")
        .orderBy("ts")
        .localCheckpoint()
    )
    streamed = stream_transform(
        spark,
        e,
        lambda s: streaming_psi(spark, s, psi_store, "event_type", "value", window=WINDOW),
        chunk_rows=250,
    ).collect()
    assert streamed  # at least one window finalized under the watermark

    for r in streamed:
        sl = e.filter(
            (F.col("ts") >= F.lit(r["window_start"])) & (F.col("ts") < F.lit(r["window_end"]))
        ).select("event_type", "value")
        want = {
            x["event_type"]: (x["n_cur"], x["psi"])
            for x in score_against_psi_reference(spark, psi_store, sl, "event_type", "value").collect()
        }
        assert r["event_type"] in want
        n, psi = want[r["event_type"]]
        assert r["n_cur"] == n
        assert r["psi"] == pytest.approx(psi, rel=1e-9)

    # the final (still-open) window must NOT have emitted
    max_ts = e.agg(F.max("ts")).first()[0]
    assert all(r["window_end"] <= max_ts for r in streamed)


def test_streaming_psi_chunk_invariant(spark, psi_store):
    e = (
        read_table(spark, SF_DIR, "events")
        .select("event_type", "ts", "value")
        .orderBy("ts")
        .localCheckpoint()
    )
    tf = lambda s: streaming_psi(spark, s, psi_store, "event_type", "value", window=WINDOW)
    a = {tuple(r) for r in stream_transform(spark, e, tf, chunk_rows=100).collect()}
    b = {tuple(r) for r in stream_transform(spark, e, tf, chunk_rows=500).collect()}
    assert a == b and a
