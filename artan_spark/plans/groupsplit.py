"""Leakage-safe (group-aware) train/val/test split — assignment keyed on
the REGISTERED DOMAIN, not the document id, so every page of a site lands
in the same split. The per-doc hash split (``docs_split_assign``) leaks
near-duplicate content across splits whenever a site hosts templated or
mirrored pages — exactly the cross-split leakage
``docs_decontaminate_minhash`` measures; grouping the split by domain is
the standard fix (group-wise splitting, e.g. scikit-learn's GroupShuffleSplit,
applied at corpus scale).

Same determinism contract as every sampler here: membership is a pure
function of the row (portable 60-bit md5 bucket of the domain string), so
the split is bit-reproducible across runs, engines, and repartitioning.

Scale shape: a stateless projection — URL canonicalization, registered
domain, hash bucket — NO shuffle, no grouping; the per-split report is one
hash aggregate. The leakage-safety invariant (one domain -> one split) holds
by construction because the bucket is a function of the domain alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from artan_spark.plans.sampling import _BUCKETS, _TRAIN, _VAL, _hash_bucket
from artan_spark.plans.urls import (
    _CANON_SQL_EXPRS,
    _SUFFIX_LIST_SQL,
    _URL_DERIVE_SQL,
    registered_domain,
    with_synthetic_url,
)
from artan_spark.sources import read_table


def group_split(df: DataFrame, group_col: str) -> Column:
    """'train'/'val'/'test' (80/10/10) keyed on ``group_col``: every row
    sharing the group value gets the same split."""
    b = _hash_bucket(F.col(group_col))
    return (
        F.when(b < _TRAIN, F.lit("train"))
        .when(b < _VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def docs_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, registered_domain, split): domain-keyed 80/10/10
    assignment over the documents table."""
    d = with_synthetic_url(
        read_table(spark, sf_dir, "documents").select("doc_id", "source")
    ).select("doc_id", registered_domain(F.col("url")).alias("registered_domain"))
    return d.withColumn("split", group_split(d, "registered_domain"))


_GROUP_SPLIT_SQL = f"""
WITH u AS ({_URL_DERIVE_SQL}),
c AS (SELECT doc_id, {_CANON_SQL_EXPRS} FROM u),
r AS (
  SELECT doc_id,
         string_split(regexp_replace(c_host, ':[0-9]+$', ''), '.') AS t,
         regexp_replace(c_host, ':[0-9]+$', '') AS h
  FROM c
),
d AS (
  SELECT doc_id,
         CASE WHEN len(t) < 2 THEN h
              WHEN len(t) >= 3 AND (t[-2] || '.' || t[-1]) IN ({_SUFFIX_LIST_SQL})
                THEN t[-3] || '.' || t[-2] || '.' || t[-1]
              ELSE t[-2] || '.' || t[-1]
         END AS registered_domain
  FROM r
)
SELECT doc_id, registered_domain,
       CASE WHEN b < {_TRAIN} THEN 'train'
            WHEN b < {_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, registered_domain,
         CAST('0x' || substring(md5(registered_domain), 1, 15) AS BIGINT)
           % {_BUCKETS} AS b
  FROM d
)
"""


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {
    "docs_group_split": (docs_group_split, _GROUP_SPLIT_SQL),
}
NO_SQL_QUERIES: dict = {}
