"""as-of join semantics on hand-built frames + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from artan_spark.plans.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(1), "a"),   # before any right row -> null
            ("u1", _ts(5), "b"),   # exactly at right row ts=5 -> inclusive match
            ("u1", _ts(9), "c"),   # between 5 and 10 -> matches 5
            ("u1", _ts(12), "d"),  # after 10 -> matches 10
            ("u2", _ts(7), "e"),   # other group, own right rows
            ("u3", _ts(3), "f"),   # group with no right rows -> null
        ],
        "user string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 50.0),
            ("u1", _ts(10), 100.0),
            ("u2", _ts(6), 60.0),
        ],
        "user string, ts timestamp, px double",
    )
    out = asof_join(left, right, on="ts", by="user", payload=["px"])
    got = {r["tag"]: r["px"] for r in out.collect()}
    assert got == {"a": None, "b": 50.0, "c": 50.0, "d": 100.0, "e": 60.0, "f": None}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof — a third
    independent implementation (besides DuckDB ASOF JOIN and the stateful
    fold). Right (key, ts) pairs are unique by construction so tie-breaking
    conventions can't differ."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame(
        {
            "k": rng.randint(0, 7, 400).astype(str),
            "ts": base + pd.to_timedelta(rng.randint(0, 10_000, 400), unit="s"),
            "lid": np.arange(400),
        }
    )
    pairs = rng.choice(7 * 10_000, 120, replace=False)
    rpd = pd.DataFrame(
        {
            "k": (pairs // 10_000).astype(str),
            "ts": base + pd.to_timedelta(pairs % 10_000, unit="s"),
            "px": rng.normal(0, 1, 120).round(6),
        }
    )
    out = (
        asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd), on="ts", by="k", payload=["px"])
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lpd.sort_values("ts", kind="stable"),
        rpd.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(out["px"], want["px"], check_names=False)


def test_asof_join_single_shuffle(spark):
    left = spark.range(10).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts"), F.lit(1.0).alias("v")
    )
    right = spark.range(5).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts"), F.lit(2.0).alias("p")
    )
    plan = asof_join(left, right, on="ts", by="k", payload=["p"])._jdf.queryExecution().executedPlan().toString()
    # one hash exchange for the window partitioning; the union itself must
    # not introduce extra exchanges
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_events_asof_join_duplicate_right_ts_deterministic(spark, tmp_path):
    """Two purchases at the same (user, ts) must give a deterministic attach:
    both the Spark query and the DuckDB oracle pre-aggregate the build side
    with max(value), so the corpus growing duplicate timestamps can't flip
    the hash comparison."""
    import duckdb
    import pandas as pd

    from artan_spark.plans.temporal import _ASOF_SQL, events_asof_join

    rows = [
        # duplicate purchase ts for user 1 — max(value)=30.0 must win
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 5), 10.0, "purchase"),
        (2, 1, dt.datetime(2024, 1, 1, 0, 0, 5), 30.0, "purchase"),
        (3, 1, dt.datetime(2024, 1, 1, 0, 0, 9), 1.0, "view"),
        (4, 2, dt.datetime(2024, 1, 1, 0, 0, 1), 7.0, "view"),
    ]
    cols = ["event_id", "user_id", "ts", "value", "event_type"]
    pdf = pd.DataFrame(rows, columns=cols)
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(sf + "/events.parquet")

    got = events_asof_join(spark, sf).orderBy("event_id").toPandas()
    assert float(got.loc[got.event_id == 3, "last_purchase_value"].iloc[0]) == 30.0
    assert pd.isna(got.loc[got.event_id == 4, "last_purchase_value"].iloc[0])

    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(_ASOF_SQL + " ORDER BY event_id").df()
    assert list(want["last_purchase_value"].fillna(-1)) == list(
        got["last_purchase_value"].fillna(-1)
    )


def test_poisson_sample_floor_matches_oracle_on_negatives(spark):
    """The mixture sample expression and the oracle's FLOOR must agree for
    negative values (a bare long cast truncates toward zero instead)."""
    import duckdb
    import pandas as pd

    vals = [-25.0, -10.0, -0.5, 0.0, 0.5, 9.9, 10.0, 25.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = [r[0] for r in df.select(F.floor(F.col("value") / 10).cast("long")).collect()]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(FLOOR(value / 10.0) AS BIGINT) FROM (SELECT unnest(?) AS value)",
            params=[vals],
        ).fetchall()
    ]
    assert got == want


def test_sessionize_gap_boundary_merges(spark):
    """An event at exactly prev + gap merges into the session (Spark's
    session_window contract); strictly past it starts a new one. The
    DuckDB oracle (strict > break) must agree on the same rows."""
    import duckdb
    import pandas as pd

    from artan_spark.plans.temporal import _SESSIONIZE_SQL, events_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, 1.0, "view"),
        (2, 1, t0 + dt.timedelta(minutes=30), 2.0, "view"),   # boundary: merges
        (3, 1, t0 + dt.timedelta(minutes=90), 4.0, "view"),   # 60m after -> new
        (4, 2, t0, 8.0, "view"),
        (5, 2, t0 + dt.timedelta(minutes=30, seconds=1), 16.0, "view"),  # splits
    ]
    cols = ["event_id", "user_id", "ts", "value", "event_type"]
    pdf = pd.DataFrame(rows, columns=cols)

    import tempfile

    with tempfile.TemporaryDirectory() as sf:
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(sf + "/events.parquet")
        got = (
            events_sessionize(spark, sf)
            .orderBy("user_id", "session_start")
            .toPandas()
        )
    assert list(got["n_events"]) == [2, 1, 1, 1]
    assert got.loc[0, "session_end"] == t0 + dt.timedelta(hours=1)

    con = duckdb.connect()
    con.register("events", pdf)
    want = con.execute(
        _SESSIONIZE_SQL + " ORDER BY user_id, session_start"
    ).df()
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events", "session_value"]],
        want[["user_id", "session_start", "session_end", "n_events", "session_value"]],
        check_dtype=False,
    )


def test_sessionize_batch_equals_stream(spark):
    """Streamed sessionization (watermark + append mode) emits exactly the
    batch sessions once the watermark passes them: replay the events table
    in ts order with a far-future flush sentinel, compare row-for-row."""
    import pandas as pd

    from artan_spark.plans.temporal import sessionize
    from artan_spark.sources import read_table
    from artan_spark.streaming.harness import stream_transform

    e = (
        read_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "ts", "value")
        .orderBy("ts")
        .limit(400)
    )
    flush = spark.createDataFrame(
        [(999_999, dt.datetime(2030, 1, 1), 0.0)], "user_id long, ts timestamp, value double"
    )

    def agg(df):
        return (
            sessionize(df, on="ts", by="user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("session_value"),
            )
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
                "session_value",
            )
        )

    batch = agg(e).toPandas()

    feed = e.unionByName(flush)  # sentinel is the LAST chunk: ts-ordered feed
    streamed = stream_transform(
        spark,
        feed,
        lambda s: agg(s.withWatermark("ts", "0 seconds")),
        chunk_rows=50,
    ).toPandas()
    streamed = streamed[streamed.user_id != 999_999]

    key = ["user_id", "session_start"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = streamed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s[b.columns], check_dtype=False)
