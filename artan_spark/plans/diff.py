"""Corpus snapshot diff: what changed between two corpus versions — the
daily-ops answer to "what did yesterday's ingest actually do" before any
expensive stage re-runs. Per doc_id the verdict is ``added`` / ``removed``
/ ``changed`` / ``unchanged``, where changed means the CONTENT HASH moved
(md5 of text — the same content identity the exact-dup store keys on).

100-TB shape: both sides project to (doc_id, source, md5) — ~50 B/doc —
before the ONE full-outer shuffle join on doc_id; text never moves. The
per-source report aggregates the verdict frame (key space = sources x 4).
A lake that keeps the exact-hash store current (plans/exact_store.py) can
skip the old-side scan entirely; this operator is the two-arbitrary-
snapshots form.

The reference engine (ozancicek/artan) has no counterpart;
beyond-reference ops diagnostics next to events_profile/skew_report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table_wide


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Row-level verdicts: (doc_id, source, status). Both inputs need
    (doc_id, source, text); source is taken from the side that has the
    row (new wins for changed/unchanged — it IS the current corpus)."""
    # presence is an explicit flag, NOT hash nullness: a doc present with
    # NULL text has a NULL md5 on that side and would otherwise be
    # misclassified as added/removed; eqNullSafe makes NULL==NULL text
    # 'unchanged' and a to/from-NULL transition 'changed'
    o = old.select(
        F.col("doc_id"),
        F.col("source").alias("src_o"),
        F.md5("text").alias("h_o"),
        F.lit(True).alias("in_o"),
    )
    n = new.select(
        F.col("doc_id"),
        F.col("source").alias("src_n"),
        F.md5("text").alias("h_n"),
        F.lit(True).alias("in_n"),
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("in_o").isNull(), F.lit("added"))
        .when(F.col("in_n").isNull(), F.lit("removed"))
        .when(F.col("h_o").eqNullSafe(F.col("h_n")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "doc_id",
        F.coalesce("src_n", "src_o").alias("source"),
        status.alias("status"),
    )


def diff_report(old: DataFrame, new: DataFrame) -> DataFrame:
    """(source, status, n_docs): the per-source rollup of corpus_diff."""
    return corpus_diff(old, new).groupBy("source", "status").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: a deterministic synthetic yesterday/today pair
    over ``documents`` exercising all four verdicts — yesterday drops
    doc_id%7==0 (added today), today drops doc_id%5==0 (removed), and
    today's doc_id%11==0 texts carry an edit marker (changed)."""
    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text")
    old = d.filter(F.col("doc_id") % 7 != 0)
    new = d.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    return diff_report(old, new)


_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
),
new AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [edited]' ELSE text END) AS h
  FROM documents WHERE doc_id % 5 <> 0
),
verdicts AS (
  SELECT COALESCE(new.source, old.source) AS source,
         CASE WHEN old.doc_id IS NULL THEN 'added'
              WHEN new.doc_id IS NULL THEN 'removed'
              WHEN old.h IS NOT DISTINCT FROM new.h THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT source, status, COUNT(*) AS n_docs FROM verdicts GROUP BY source, status
"""

QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES = {"docs_snapshot_diff": (docs_snapshot_diff, _SNAPSHOT_DIFF_SQL)}
