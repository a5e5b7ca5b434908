"""Training-export stage: deterministic corpus shuffle + sharded write —
the LAST step of a curation pipeline, after the gates/dedup/mixing have
picked the keep set. Training wants document order decorrelated from crawl
order and source adjacency (consecutive same-site pages in a batch hurt);
the standard fix is a pseudo-random but REPRODUCIBLE order, so a re-export
of the same corpus bit-reproduces the same shards (checkpoint/restart and
multi-site exports must agree without coordination).

Order and shard come from the same portable 60-bit md5(doc_id) machinery
every sampler in plans/sampling.py keys on:

    shard = md5_60(doc_id) % n_shards        (binomial-balanced)
    okey  = md5(doc_id) hex                  (order within the shard)

100-TB shape: the assignment is a stateless row-wise projection (ZERO
shuffles for the plan itself); the write moves each row ONCE (repartition
on shard) and sorts only within shards. A GLOBAL pseudo-random order
(ntile/row_number over md5) would need a single total-order sort — the
per-shard order is equally decorrelated and embarrassingly parallel.
One shard = one training file: in production n_shards is picked large
(thousands), so a shard is worker-file-sized; the driver-table entry uses
8 for the report.

The reference engine (ozancicek/artan) has no counterpart; beyond-reference
surface next to the mixing/sampling family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table_wide

N_EXPORT_SHARDS = 8

_TWO60 = 1 << 60


def _md5_60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def shard_assignments(docs: DataFrame, n_shards: int = N_EXPORT_SHARDS) -> DataFrame:
    """docs + (shard, okey): a pure projection — no shuffle, no state."""
    return docs.withColumn("shard", _md5_60(F.col("doc_id")) % n_shards).withColumn(
        "okey", F.md5(F.col("doc_id").cast("string"))
    )


def write_training_shards(
    docs: DataFrame, out_dir: str, n_shards: int = N_EXPORT_SHARDS
) -> None:
    """Materialize the export: one okey-sorted parquet file per shard under
    ``out_dir/shard=<i>/``. Each shard lands wholly in one task (repartition
    on the shard column), so the per-shard sort is local and the file's row
    order IS the training order. Re-running on the same corpus rewrites
    byte-identical assignments."""
    a = shard_assignments(docs, n_shards)
    (
        a.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "okey")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def read_training_shard(spark: SparkSession, out_dir: str, shard: int) -> DataFrame:
    """One shard, rows in training order (single file per shard by the
    write contract, so parquet scan order == written order)."""
    return spark.read.parquet(f"{out_dir}/shard={shard}")


def export_plan(docs: DataFrame, n_shards: int = N_EXPORT_SHARDS) -> DataFrame:
    """The export manifest: per-shard doc/token volume + the order-key
    range — what a training job reads to size its data-loader splits
    BEFORE touching the shards. One hash aggregate over the projection."""
    a = shard_assignments(docs, n_shards)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.min("okey").alias("first_okey"),
            F.max("okey").alias("last_okey"),
        )
    )


def docs_export_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: the 8-shard export manifest of ``documents``."""
    return export_plan(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "text")
    )


_EXPORT_PLAN_SQL = f"""
SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         % {N_EXPORT_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS n_tokens,
       MIN(md5(CAST(doc_id AS VARCHAR))) AS first_okey,
       MAX(md5(CAST(doc_id AS VARCHAR))) AS last_okey
FROM documents
GROUP BY 1
"""

QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES = {"docs_export_plan": (docs_export_plan, _EXPORT_PLAN_SQL)}
