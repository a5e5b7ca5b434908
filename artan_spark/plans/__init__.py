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
    bm25,
    crosscorpus,
    dedup,
    diff,
    dsir,
    estimation,
    exact_store,
    export,
    groupsplit,
    lm,
    multimodal,
    neardup_store,
    pipeline,
    profile,
    quality_clf,
    relational,
    sampling,
    simsearch,
    sketch,
    sketch_store,
    skew,
    temporal,
    tokeval,
    textstats,
    tokenizer_store,
    unigram,
    urls,
    wordpiece,
    zorder,
)

# Order matters: the driver's correctness harness checks a bounded prefix of
# the registry (50 entries), so every oracle-bearing query must sit inside
# that window — keep the registry at <=50 entries total and multimodal last.
MODULES = (
    relational,
    dedup,
    simsearch,
    textstats,
    estimation,
    temporal,
    sketch,
    sampling,
    pipeline,
    lm,
    dsir,
    bm25,
    urls,
    unigram,
    quality_clf,
    neardup_store,
    tokenizer_store,
    sketch_store,
    wordpiece,
    crosscorpus,
    exact_store,
    export,
    groupsplit,
    profile,
    skew,
    zorder,
    diff,
    tokeval,
    multimodal,
)

QUERIES = {}
ORACLES = {}
# oracle-checked in pytest only; not part of the driver registry window
# (their compute is covered there by compound entries)
PYTEST_ORACLES = {}
# genuinely non-SQL-expressible wrappers (no DuckDB oracle possible);
# pinned by bit-exact Python replay + property tests
NO_SQL_QUERIES = {}
for _m in MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))
    PYTEST_ORACLES.update(getattr(_m, "PYTEST_ORACLES", {}))
    NO_SQL_QUERIES.update(getattr(_m, "NO_SQL_QUERIES", {}))

# Not an assert: the guard must survive `python -O`, and a clear error beats
# an AssertionError raised from every `import artan_spark.plans`.
if len(QUERIES) > 50:
    raise RuntimeError(
        f"query registry has {len(QUERIES)} entries but the driver's correctness "
        "harness checks only the first 50 — move the extras to PYTEST_ORACLES"
    )

__all__ = ["QUERIES", "ORACLES", "PYTEST_ORACLES", "NO_SQL_QUERIES"]
