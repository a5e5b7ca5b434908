"""Query/pipeline inventory: every entry has a Spark implementation and,
where SQL-expressible, a DuckDB oracle (SURVEY §2.6 delegations + the
large-scale training-data pipeline operators).

Registry contract: ``QUERIES[name](spark, sf_dir) -> DataFrame`` and
``ORACLES[name] -> SQL`` runnable by DuckDB against views named after the
testdata tables. Column names/aliases match exactly between both sides;
double aggregates are rounded identically on both sides so the driver's
order-insensitive value hash is stable across engines.
"""

from artan_spark.plans import (
    dedup,
    estimation,
    multimodal,
    relational,
    sampling,
    simsearch,
    sketch,
    temporal,
    textstats,
)

MODULES = (
    relational,
    dedup,
    simsearch,
    textstats,
    estimation,
    multimodal,
    temporal,
    sketch,
    sampling,
)

QUERIES = {}
ORACLES = {}
for _m in MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))

__all__ = ["QUERIES", "ORACLES"]
