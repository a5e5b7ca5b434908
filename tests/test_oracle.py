"""Local mirror of the driver's correctness gate: every inventory query with
a DuckDB oracle must match exactly at sf0.001 (row count, columns, values)."""

import pytest

from artan_spark.plans import ORACLES, PYTEST_ORACLES, QUERIES
from artan_spark.plans.oracle import compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    r = compare(spark, QUERIES[name], ORACLES[name], SF_DIR)
    assert r["match"], f"{name}: {r}"


@pytest.mark.parametrize("name", sorted(PYTEST_ORACLES))
def test_pytest_only_oracle_parity(spark, name):
    """Queries folded into compound registry entries keep their own
    oracle checks here (they are not in the driver's bounded window)."""
    fn, sql = PYTEST_ORACLES[name]
    r = compare(spark, fn, sql, SF_DIR)
    assert r["match"], f"{name}: {r}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20
