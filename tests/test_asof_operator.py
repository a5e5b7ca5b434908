"""StreamingAsofJoin: the stateful-fold formulation must agree with the
batch window formulation (plans/temporal.asof_join) row-for-row, in batch
AND under streamed replay."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from artan_spark.operators import StreamingAsofJoin
from artan_spark.plans.temporal import asof_join
from artan_spark.sources import read_table
from artan_spark.streaming.harness import stream_transform

from conftest import SF_DIR


def _union_input(spark):
    e = read_table(spark, SF_DIR, "events").filter(F.col("user_id") < 24)
    left = e.select(
        (F.col("user_id") % 8).cast("string").alias("key"),
        "ts",
        F.lit(1).alias("side"),
        F.array("value").alias("payload"),
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 8).cast("string").alias("key"),
        "ts",
        F.lit(0).alias("side"),
        F.array("value").alias("payload"),
    )
    return left.unionByName(right), e


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["asofPayload"] = out["asofPayload"].map(lambda v: None if v is None else tuple(v))
    out["payload"] = out["payload"].map(tuple)
    return out.sort_values(["stateKey", "eventTime", "payload"]).reset_index(drop=True)


def test_asof_operator_matches_window_formulation(spark):
    u, e = _union_input(spark)
    op = StreamingAsofJoin().setStateKeyCol("key").setEventTimeCol("ts")
    got = _norm(op.transform(u).toPandas())

    sub = e.filter(F.col("user_id") < 24)
    left = sub.select(
        (F.col("user_id") % 8).cast("string").alias("key"), "ts", F.array("value").alias("payload")
    )
    right = sub.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 8).cast("string").alias("key"),
        "ts",
        F.array("value").alias("asofPayload"),
        F.col("ts").alias("asofTime"),
    )
    want = asof_join(left, right, on="ts", by="key", payload=["asofPayload", "asofTime"])
    want = _norm(
        want.select(
            F.col("key").alias("stateKey"), F.col("ts").alias("eventTime"),
            "payload", "asofPayload", "asofTime",
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, want)


def test_asof_operator_batch_equals_stream(spark):
    u, _ = _union_input(spark)
    u = u.limit(200)
    op = (
        StreamingAsofJoin()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setWatermarkDuration("0 seconds")
    )
    batch = _norm(op.transform(u).toPandas())
    streamed = _norm(stream_transform(spark, u, op.transform, chunk_rows=7).toPandas())
    pd.testing.assert_frame_equal(batch, streamed)


def _pdf(rows):
    """rows: list of (side, ts_minutes, payload) for one key."""
    import numpy as np

    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "stateKey": ["k"] * len(rows),
            "eventTime": [np.datetime64(base + pd.Timedelta(minutes=m), "us") for _, m, _ in rows],
            "side": [s for s, _, _ in rows],
            "payload": [None if p is None else np.asarray(p, float) for _, _, p in rows],
        }
    )


def test_asof_fold_out_of_order_semantics():
    """Late rows the watermark admits must keep the as-of contract:
    never attach a build row from the probe's future, never let a batch of
    late build rows regress the stored state."""
    from artan_spark.operators.asof import _asof_fold_factory

    fold = _asof_fold_factory({})

    # batch 1: build(t=10) only
    out, state = fold(_pdf([(0, 10, [10.0])]), None)
    assert len(out) == 0 and float(state["payload"][0]) == 10.0

    # batch 2: late probe(t=5) — stored build is in its future => null attach
    out, state = fold(_pdf([(1, 5, [1.0])]), state)
    assert len(out) == 1 and out["asofPayload"].iloc[0] is None

    # batch 3: late build(t=3) + probe(t=12) — stored build(10) beats the
    # older in-batch build(3); state must NOT regress to t=3
    out, state = fold(_pdf([(0, 3, [3.0]), (1, 12, [2.0])]), state)
    assert float(out["asofPayload"].iloc[0][0]) == 10.0
    assert float(state["payload"][0]) == 10.0

    # batch 4: newer build(t=20) advances state; probe(t=25) sees it
    out, state = fold(_pdf([(0, 20, [20.0]), (1, 25, [4.0])]), state)
    assert float(out["asofPayload"].iloc[0][0]) == 20.0
    assert float(state["payload"][0]) == 20.0


def test_asof_operator_out_of_order_stream(spark):
    """End-to-end: one row per micro-batch in shuffled event-time order; the
    streamed result must match the hand-computed as-of attach."""
    base = pd.Timestamp("2024-01-01")
    arrival = [  # (side, minutes, payload)
        (0, 10, [10.0]),
        (1, 5, [1.0]),   # late probe -> null
        (1, 12, [2.0]),  # -> build(10)
        (0, 3, [3.0]),   # late build, must not regress state
        (1, 15, [4.0]),  # -> build(10)
        (0, 20, [20.0]),
        (1, 25, [5.0]),  # -> build(20)
    ]
    rows = [("k", (base + pd.Timedelta(minutes=m)).to_pydatetime(), s, p) for s, m, p in arrival]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, side int, payload array<double>"
    )
    op = (
        StreamingAsofJoin()
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setWatermarkDuration("1 day")
    )
    got = stream_transform(spark, df, op.transform, chunk_rows=1).toPandas()
    got["m"] = got["eventTime"].map(lambda t: int((t - base).total_seconds() // 60))
    got = got.sort_values("m").reset_index(drop=True)
    expect = {5: None, 12: 10.0, 15: 10.0, 25: 20.0}
    assert sorted(got["m"]) == sorted(expect)
    for _, r in got.iterrows():
        want = expect[r["m"]]
        if want is None:
            assert r["asofPayload"] is None
        else:
            assert float(r["asofPayload"][0]) == want


def test_asof_state_expires_past_horizon(spark):
    """Keys are unbounded in an as-of stream, so state must be evictable:
    with an event-time timeout, a key idle past the horizon restarts from
    null — its next probe attaches nothing — while a probe within the
    horizon still attaches the stored build row. Without a timeout the
    build row attaches indefinitely (full-history semantics)."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        ("a", 0, 0, [10.0]),     # build for key a
        ("a", 30, 1, [1.0]),     # probe within horizon -> attaches 10.0
        ("b", 180, 1, [0.5]),    # other-key traffic advances the watermark
        ("a", 210, 1, [2.0]),    # probe 3h after key a's last row
    ]
    df = spark.createDataFrame(
        [(k, (base + pd.Timedelta(minutes=m)).to_pydatetime(), s, p) for k, m, s, p in rows],
        "key string, ts timestamp, side int, payload array<double>",
    )

    def run(timeout):
        op = (
            StreamingAsofJoin()
            .setStateKeyCol("key")
            .setEventTimeCol("ts")
            .setWatermarkDuration("1 hour")
        )
        if timeout:
            op = op.setStateTimeoutMode("event")
        out = stream_transform(spark, df, op.transform, chunk_rows=1).toPandas()
        out["m"] = out["eventTime"].map(lambda t: int((t - base).total_seconds() // 60))
        return {
            (r["stateKey"], r["m"]): None if r["asofPayload"] is None else float(r["asofPayload"][0])
            for _, r in out.iterrows()
        }

    full = run(False)
    assert full[("a", 30)] == 10.0
    assert full[("a", 210)] == 10.0  # no timeout: state lives forever

    bounded = run(True)
    assert bounded[("a", 30)] == 10.0   # within the horizon: still attached
    assert bounded[("a", 210)] is None  # idle 3h > 1h horizon: state evicted


def test_asof_fold_randomized_against_simulator():
    """Randomized micro-batch replays vs an independent plain-Python
    simulator of the documented contract: state holds the max-ts build row
    seen so far; a probe attaches the max-ts admissible (<= probe.ts)
    candidate among the in-batch builds and the pre-batch state, else null.
    Also checks the invariant that an attach never comes from the future."""
    import numpy as np

    from artan_spark.operators.asof import _asof_fold_factory

    rng = np.random.RandomState(11)
    for trial in range(20):
        fold = _asof_fold_factory({})
        n = int(rng.randint(5, 40))
        rows = [
            (int(rng.randint(0, 2)), int(rng.randint(0, 500)), [float(i)])
            for i in range(n)
        ]
        # random batch boundaries
        cuts = sorted(set(rng.choice(range(1, n), size=min(5, n - 1), replace=False)))
        batches, prev = [], 0
        for c in list(cuts) + [n]:
            batches.append(rows[prev:c])
            prev = c

        state = None
        sim_state = None  # (ts, payload)
        got, want = [], []
        for batch in batches:
            out, state = fold(_pdf(batch), state)
            for _, r in out.iterrows():
                ts = None if pd.isna(pd.Timestamp(r["asofTime"]) if r["asofTime"] is not None else pd.NaT) else int(
                    (pd.Timestamp(r["asofTime"]) - pd.Timestamp("2024-01-01")).total_seconds() // 60
                )
                got.append((int(r["payload"][0]), ts))
                if ts is not None:
                    probe_m = int((pd.Timestamp(r["eventTime"]) - pd.Timestamp("2024-01-01")).total_seconds() // 60)
                    assert ts <= probe_m, "attached a future build row"

            # simulator: event-time order, builds before probes at equal ts,
            # stable within the batch
            ordered = sorted(batch, key=lambda x: (x[1], x[0]))
            in_batch = []  # (ts, payload) builds seen so far, this batch
            for side, m, payload in ordered:
                if side == 0:
                    in_batch.append((m, payload))
                else:
                    cands = [c for c in in_batch if c[0] <= m]
                    best = max(cands, key=lambda c: c[0]) if cands else None
                    if sim_state is not None and sim_state[0] <= m and (
                        best is None or sim_state[0] > best[0]
                    ):
                        best = sim_state
                    want.append((int(payload[0]), best[0] if best else None))
            if in_batch:
                mx = max(in_batch, key=lambda c: c[0])
                if sim_state is None or mx[0] >= sim_state[0]:
                    sim_state = mx
        assert got == want, f"trial {trial}: {got} != {want}"
