"""StreamingRollingZScore: batch==stream, chunk invariance, parity with the
window-based batch operator (plans/temporal.rolling_zscore)."""

import math

import pytest
from pyspark.sql import functions as F

from artan_spark.sources import read_table
from artan_spark.streaming import StreamingRollingZScore, stream_transform

SF = "/root/testdata/sf0.001"


def _op():
    return (
        StreamingRollingZScore()
        .setStateKeyCol("user_id")
        .setEventTimeCol("ts")
    )


def _events(spark):
    return read_table(spark, SF, "events").select("user_id", "event_id", "ts", "value")


def _by_id(rows):
    return {r["event_id"]: r for r in rows}


def test_matches_batch_window_operator(spark):
    """The stateful fold reproduces the window-based batch operator: same
    scored row set, same baselines, z equal to float noise (numpy pairwise
    vs Spark window sequential summation)."""
    from artan_spark.plans.temporal import rolling_zscore

    fold = _by_id(_op().transform(_events(spark)).collect())
    win = _by_id(rolling_zscore(_events(spark)).collect())
    assert set(fold) == set(win)
    for i in fold:
        assert fold[i]["n_baseline"] == win[i]["n_baseline"], i
        a, b = fold[i]["z"], win[i]["z"]
        if a is None or b is None:
            assert a is None and b is None, i
        else:
            assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12), i


def test_stream_chunk_invariant_and_equals_batch(spark):
    """Chunked streaming replay == the fold's own batch run BIT-exactly,
    at two different chunkings (every score recomputes from the identical
    trailing array, so micro-batch boundaries cannot show through)."""
    ev = _events(spark).orderBy("ts", "event_id").limit(120)
    batch = _by_id(_op().transform(ev).collect())
    for chunk in (7, 31):
        got = _by_id(
            stream_transform(spark, ev, lambda df: _op().transform(df), chunk_rows=chunk).collect()
        )
        assert set(got) == set(batch), chunk
        for i in got:
            assert got[i].asDict() == batch[i].asDict(), (chunk, i)


def test_fold_replay_matches_plain_python(spark):
    """The fold's arithmetic replayed in plain Python (no pandas/Spark in
    the loop) is bit-exact: mean/std over the same trailing slice."""
    import numpy as np

    rows = sorted(
        _events(spark).filter(F.col("user_id") == 1).collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    got = _by_id(_op().transform(_events(spark).filter(F.col("user_id") == 1)).collect())
    vals = [r["value"] for r in rows]
    for i, r in enumerate(rows):
        win = np.asarray(vals[max(0, i - 20) : i], dtype=float)
        if len(win) < 5:
            assert r["event_id"] not in got
            continue
        sd = float(win.std(ddof=1))
        expect = float((vals[i] - win.mean()) / sd) if sd > 0 else None
        assert got[r["event_id"]]["z"] == expect, r["event_id"]
