"""Table profiler + leakage-safe group split. (Oracle parity at sf0.001 is
in test_oracle.py via PYTEST_ORACLES; the plan lint sweeps both.)"""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.groupsplit import docs_group_split, group_split
from artan_spark.plans.profile import events_profile, profile_table
from artan_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


# -- profiler -----------------------------------------------------------------


def test_profile_values_replay(spark):
    """Profile row of each column replays against plain-Python computation
    over the collected table."""
    rows = read_table(spark, SF_DIR, "events").collect()
    got = {r["column"]: r for r in events_profile(spark, SF_DIR).collect()}
    assert set(got) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    vals = [r["value"] for r in rows if r["value"] is not None]
    assert got["value"]["n_rows"] == len(rows)
    assert got["value"]["n_nulls"] == len(rows) - len(vals)
    assert got["value"]["n_distinct"] == len(set(vals))
    assert got["value"]["min_num"] == min(vals)
    assert got["value"]["max_num"] == max(vals)
    assert got["value"]["min_str"] is None
    ets = [r["event_type"] for r in rows if r["event_type"] is not None]
    assert got["event_type"]["min_str"] == min(ets)
    assert got["event_type"]["max_str"] == max(ets)
    assert got["event_type"]["min_num"] is None
    # timestamp as epoch seconds
    tss = [r["ts"].timestamp() for r in rows if r["ts"] is not None]
    assert got["ts"]["min_num"] == pytest.approx(min(tss), abs=0)
    assert got["ts"]["max_num"] == pytest.approx(max(tss), abs=0)


def test_profile_handles_nulls_and_complex_types(spark):
    df = spark.createDataFrame(
        [(1, None, [1, 2]), (None, "b", None), (1, "b", [3])],
        "a long, s string, arr array<long>",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["a"]["n_nulls"] == 1 and got["a"]["n_distinct"] == 1
    assert got["s"]["n_nulls"] == 1 and got["s"]["min_str"] == "b"
    # complex type: counts profiled, min/max left NULL
    assert got["arr"]["n_nulls"] == 1 and got["arr"]["n_distinct"] == 2
    assert got["arr"]["min_num"] is None and got["arr"]["min_str"] is None


def test_profile_approx_within_hll_error(spark):
    """exact=False swaps COUNT(DISTINCT) for HLL: within 3x the default 5%
    rsd of exact, all other columns identical."""
    t = read_table(spark, SF_DIR, "events")
    ex = {r["column"]: r for r in profile_table(t, exact=True).collect()}
    ap = {r["column"]: r for r in profile_table(t, exact=False).collect()}
    for c in ex:
        assert ap[c]["n_nulls"] == ex[c]["n_nulls"]
        assert ap[c]["min_num"] == ex[c]["min_num"]
        assert ap[c]["max_str"] == ex[c]["max_str"]
        assert abs(ap[c]["n_distinct"] - ex[c]["n_distinct"]) <= 0.15 * ex[c]["n_distinct"] + 1


def test_profile_approx_plan_has_no_expand(spark):
    """The 100-TB point of exact=False: no Expand node (the multi-distinct
    rewrite) in the physical plan."""
    t = read_table(spark, SF_DIR, "events")
    exact_plan = profile_table(t, exact=True)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_table(t, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # the price of exactness, documented
    assert "Expand" not in approx_plan


# -- group split ----------------------------------------------------------------


def test_group_split_no_domain_straddles_splits(spark):
    """The leakage-safety invariant: every registered domain maps to
    exactly one split."""
    per_domain = (
        docs_group_split(spark, SF_DIR)
        .groupBy("registered_domain")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert per_domain and all(r["k"] == 1 for r in per_domain)


def test_group_split_is_hash_of_domain(spark):
    """Assignment replays from the domain string alone (pure function —
    the determinism contract every sampler shares)."""
    import hashlib

    rows = docs_group_split(spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        b = int(hashlib.md5(r["registered_domain"].encode()).hexdigest()[:15], 16) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert r["split"] == want, r


def test_group_split_generic_column(spark):
    """group_split composes on any frame/column — all rows of a group
    agree, different groups can differ."""
    df = spark.createDataFrame(
        [(i, f"g{i % 7}") for i in range(70)], "id long, g string"
    )
    out = df.withColumn("split", group_split(df, "g"))
    per_g = out.groupBy("g").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_g)
