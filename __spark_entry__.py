"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The inventory lives in ``artan_spark.plans`` — relational delegations
(SURVEY §2.6), dedup / similarity-search / text-analysis / temporal-join /
sketch / sampling pipeline operators, and the SURVEY §2.1 estimation
operators. Every registry query (50 entries, sized to the driver's check
window) carries a DuckDB oracle: recursive-CTE for the estimation
recursions (bit-exact for the scalar ones, margin-guarded rounding for the
sigma-point/consensus/3-D variants — see plans/estimation.py and
tests/test_oracle_margins.py), generate_series reconstruction for the
multimodal stub payload. Queries folded into compound entries keep
pytest-only oracles (artan_spark.plans.PYTEST_ORACLES).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: model-parallel linear Kalman filtering of the events stream
    (32 independent local-level models keyed by user), sf0.001."""
    from artan_spark.plans.estimation import lkf_events_local_level

    return lkf_events_local_level(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from artan_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from artan_spark.plans import ORACLES

    return dict(ORACLES)
