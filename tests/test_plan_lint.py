"""Global plan lint: every registry query's PHYSICAL plan is free of the
scale anti-patterns the 100-TB posture forbids — an unconditional
CartesianProduct (all-pairs blowup) and row-at-a-time Python evaluation
(BatchEvalPython; Arrow-batched mapInPandas/ArrowEvalPython are the
sanctioned Python path). Broadcast nested-loop joins are allowed: every
one in the registry carries a 1-row / centroid / codebook / bucket-sized
build side (audited per-operator in their own tests).

This is the sweep version of the per-operator plan assertions: a future
edit that quietly degrades a join into a cartesian, or drops an Arrow
batch hint into per-row eval, fails HERE with the query named, instead of
surfacing as a timeout three rounds later."""

import pytest

from artan_spark.plans import NO_SQL_QUERIES, PYTEST_ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

_FORBIDDEN = (
    "CartesianProduct",
    "BatchEvalPython",  # row-at-a-time Python UDF (Arrow variants excluded)
)

_ALL = sorted(
    list(QUERIES)
    + list(PYTEST_ORACLES)
    + list(NO_SQL_QUERIES)
)


def _fn(name):
    if name in QUERIES:
        return QUERIES[name]
    if name in PYTEST_ORACLES:
        return PYTEST_ORACLES[name][0]
    return NO_SQL_QUERIES[name]


@pytest.mark.parametrize("name", _ALL)
def test_plan_has_no_scale_antipatterns(spark, name):
    df = _fn(name)(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for pat in _FORBIDDEN:
        assert pat not in plan, f"{name}: {pat} in physical plan"
