"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", NeurIPS —
public) re-expressed Spark-first.

DSIR selects raw-corpus documents whose HASHED N-GRAM distribution looks
like a small trusted target corpus: fit two bag-of-hashed-ngrams unigram
distributions (target ``p`` and raw ``q``, both over ``DSIR_BUCKETS``
hash buckets), give every raw doc the importance weight

    log w(x) = sum_over_features  count_x[b] * (ln p[b] - ln q[b])

and resample without replacement via the Gumbel top-k trick: select the
``k`` docs with the largest ``log w + Gumbel noise``. This implementation
is fully deterministic (hence cross-engine oracle-able): the Gumbel draw
comes from the portable 60-bit md5 prefix of ``doc_id`` —
``g = -ln(-ln(u))`` with ``u = (md5_60(doc_id)+0.5)/2^60`` — the same
hash-uniform construction every sampler in ``plans/sampling.py`` uses.

Features are the paper's: whitespace unigrams AND bigrams, hashed into
``DSIR_BUCKETS`` buckets (they use 10k; the driver corpus is small so the
default here is 4096 — a parameter). Both distributions are smoothed
add-``DSIR_ALPHA``.

The reference engine (ozancicek/artan) has no counterpart; this is the
third published data-selection stage next to the Gopher gates and the LM
perplexity filter (``plans/lm.py``).

100-TB shape:
- the p/q tables are BUCKET-sized (4096 rows) — broadcast by size-based
  planning into the per-doc-feature join; the totals are 1-row broadcast
  aggregates;
- per-doc feature counts are one explode + (doc, bucket) partial agg —
  shuffle volume bounded by n_docs x distinct-buckets-per-doc, never the
  token stream itself twice;
- selection is sort-limit (distributed TakeOrdered), NOT a global
  row_number window — the per-doc frame at corpus scale must not funnel
  through one partition; the selected id set (k rows) then size-gated
  broadcasts back for the flag join;
- ``k`` derives from a corpus count at plan-construction time (EAGER,
  like the dedup passes — build when the input is ready).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.sources import read_table, read_table_wide

DSIR_BUCKETS = 4096  # hashed feature space (paper: 10k)
DSIR_ALPHA = 0.5  # add-alpha smoothing for both distributions
DSIR_FRAC = 0.25  # default selected fraction when k is not given
# broadcast the selected id set only below this row count (matches
# pipeline.BROADCAST_LOSER_LIMIT); above it, plain shuffled join
DSIR_BROADCAST_LIMIT = 2_000_000

_TWO60 = float(1 << 60)


def _bucket(col: F.Column) -> F.Column:
    """Portable 60-bit md5 prefix -> feature bucket (verified Spark ==
    DuckDB in plans/sampling.py, including the empty string)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % DSIR_BUCKETS
    ).alias("b")


def _doc_features(base: DataFrame) -> DataFrame:
    """(doc_id, source, t) -> (doc_id, b) one row per FEATURE OCCURRENCE:
    every unigram token and every adjacent bigram (joined with a space),
    hashed. In-row construction, one explode."""
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    feats = F.concat(F.col("t"), bigrams)
    return base.select("doc_id", F.explode(feats).alias("f")).select(
        "doc_id", _bucket(F.col("f"))
    )


def dsir_select(
    d: DataFrame,
    target_source: str | None = None,
    k: int | None = None,
    frac: float = DSIR_FRAC,
    alpha: float = DSIR_ALPHA,
    memo_key: tuple | None = None,
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, logw, score, selected).

    ``target_source`` names the trusted slice (default: lexicographically
    smallest source, via broadcast semi-join). ``score`` is the rounded
    Gumbel-perturbed log-weight the top-``k`` selection orders by
    (ties broken by doc_id); ``selected`` marks the chosen docs. ``k``
    defaults to ``ceil(frac * n_docs)`` (EAGER corpus count)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", toks.alias("t"))

    if target_source is None:
        ms = base.agg(F.min("source").alias("source"))
        tgt = base.join(F.broadcast(ms), "source", "left_semi")
    else:
        tgt = base.filter(F.col("source") == target_source)

    # ONE pass over the hashed feature stream: the per-(doc, bucket)
    # counts are a sufficient statistic for everything downstream — the
    # raw distribution is its bucket marginal and the target distribution
    # is its bucket marginal over the target docs. The pre-round-8 shape
    # re-derived the explode+md5 stream separately for q, p, and the
    # per-doc counts (3 corpus passes). localCheckpoint (EAGER, like the
    # dedup passes — the plan re-planned the stream per consumer, exchange
    # reuse did not fire across the three aggregation shapes): the
    # checkpoint is (doc x distinct-buckets) narrow rows — corpus-count
    # metadata, not corpus text. This IS the NB classifier's feature
    # statistic (same _doc_features, same aggregation), so driver-table
    # callers share _NB_DOCF_CACHE — one fit per session serves
    # docs_dsir_select AND the quality-classifier entries.
    from artan_spark.plans.quality_clf import _NB_DOCF_CACHE, _nb_evict_stale

    docf = _NB_DOCF_CACHE.get(memo_key) if memo_key is not None else None
    if docf is None:
        docf = (
            _doc_features(base)
            .groupBy("doc_id", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint()
        )
        if memo_key is not None:
            _nb_evict_stale(memo_key)
            _NB_DOCF_CACHE[memo_key] = docf

    q_tab = docf.groupBy("b").agg(F.sum("c").alias("cq"))
    p_tab = (
        docf.join(tgt.select("doc_id"), "doc_id", "left_semi")
        .groupBy("b")
        .agg(F.sum("c").alias("cp"))
    )
    q_tot = q_tab.agg(F.sum("cq").alias("nq"))
    p_tot = p_tab.agg(F.sum("cp").alias("np"))
    denom = F.lit(alpha) * F.lit(DSIR_BUCKETS)
    lp = F.log((F.coalesce(F.col("cp").cast("double"), F.lit(0.0)) + alpha) / (F.col("np") + denom))
    lq = F.log((F.coalesce(F.col("cq").cast("double"), F.lit(0.0)) + alpha) / (F.col("nq") + denom))
    logw = (
        docf.join(p_tab, "b", "left")
        .join(q_tab, "b", "left")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(q_tot))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * (lp - lq)), 6).alias("logw"))
    )

    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(_TWO60)
    gumbel = -F.log(-F.log(u))
    scored = (
        base.select("doc_id", "source")
        .join(logw, "doc_id")
        .withColumn("score", F.round(F.col("logw") + gumbel, 6))
    )

    if k is None:
        k = math.ceil(frac * base.count())  # EAGER, documented
    topk = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id")
    )
    # TakeOrderedAndProject materializes k rows; broadcasting that set back
    # is only sound while k is small. Count-gate it like
    # pipeline.BROADCAST_LOSER_LIMIT — above the gate, fall back to a plain
    # shuffled join (k id rows, still narrow) instead of an ungated
    # driver-side broadcast of a corpus-sized id set.
    sel = topk.withColumn("selected", F.lit(True))
    if k <= DSIR_BROADCAST_LIMIT:
        sel = F.broadcast(sel)
    return scored.join(sel, "doc_id", "left").select(
        "doc_id", "source", "logw", "score", F.coalesce("selected", F.lit(False)).alias("selected")
    )


def docs_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: DSIR selection over ``documents``, target = the
    lexicographically-smallest source, k = ceil(0.25 * n_docs)."""
    from artan_spark.plans.quality_clf import _nb_memo_key

    return dsir_select(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        memo_key=_nb_memo_key(spark, sf_dir),
    )


_DSIR_SQL = f"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
feats AS (
  SELECT doc_id, CAST('0x' || substring(md5(f), 1, 15) AS BIGINT) % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, unnest(t) AS f FROM base
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i+1] AS f
    FROM base, unnest(range(1, len(t))) AS u(i)
  )
),
tgt AS (SELECT doc_id FROM base WHERE source = (SELECT MIN(source) FROM base)),
q_tab AS (SELECT b, COUNT(*) AS cq FROM feats GROUP BY b),
p_tab AS (SELECT b, COUNT(*) AS cp FROM feats JOIN tgt USING (doc_id) GROUP BY b),
q_tot AS (SELECT SUM(cq) AS nq FROM q_tab),
p_tot AS (SELECT SUM(cp) AS np FROM p_tab),
docf AS (SELECT doc_id, b, COUNT(*) AS c FROM feats GROUP BY doc_id, b),
lw AS (
  SELECT doc_id,
         ROUND(SUM(c * (ln((COALESCE(cp, 0) + {DSIR_ALPHA}) / (np + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                      - ln((COALESCE(cq, 0) + {DSIR_ALPHA}) / (nq + {DSIR_ALPHA} * {DSIR_BUCKETS})))), 6) AS logw
  FROM docf
  LEFT JOIN p_tab USING (b)
  LEFT JOIN q_tab USING (b)
  CROSS JOIN p_tot CROSS JOIN q_tot
  GROUP BY doc_id
),
scored AS (
  SELECT b.doc_id, b.source, lw.logw,
         ROUND(lw.logw
               - ln(-ln((CAST(CAST('0x' || substring(md5(CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
                        / {_TWO60})), 6) AS score
  FROM base b JOIN lw ON b.doc_id = lw.doc_id
),
k AS (SELECT CAST(CEIL({DSIR_FRAC} * COUNT(*)) AS BIGINT) AS k FROM base),
topk AS (
  SELECT doc_id FROM scored CROSS JOIN k
  ORDER BY score DESC, doc_id ASC
  LIMIT (SELECT k FROM k)
)
SELECT s.doc_id, s.source, s.logw, s.score,
       s.doc_id IN (SELECT doc_id FROM topk) AS selected
FROM scored s
"""


# r11 window rotation: DSIR selection joined the driver window
QUERIES = {"docs_dsir_select": docs_dsir_select}
ORACLES = {"docs_dsir_select": _DSIR_SQL}
PYTEST_ORACLES: dict = {}


# -- source-distribution divergence --------------------------------------------


def source_divergence(d: DataFrame, alpha: float = DSIR_ALPHA) -> DataFrame:
    """(doc_id, source, text) -> (source, n_feats, js_divergence): per
    source, the Jensen-Shannon divergence between that source's hashed
    unigram+bigram distribution and the WHOLE corpus distribution — the
    mixing diagnostic that says which sources are distributionally far
    from the blend (a drifted crawl slice, a mis-tagged dump). JS is
    symmetric and bounded by ln 2, so scores are comparable across
    rounds; both distributions are add-alpha smoothed over the FULL
    bucket space (zero-count buckets carry smoothed mass, so the sum runs
    over all DSIR_BUCKETS cells per source).

    100-TB shape: ONE corpus pass (the DSIR feature stream) into a
    (source, bucket) hash-agg; everything after operates on the
    sources x DSIR_BUCKETS grid (a few 10k rows at ANY corpus size) with
    broadcast totals — the corpus text is never touched again."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", toks.alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(" ", F.element_at("t", i), F.element_at("t", i + 1)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    feats = base.select("source", F.explode(F.concat(F.col("t"), bigrams)).alias("f")).select(
        "source", _bucket(F.col("f"))
    )
    cs = feats.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c"))
    ns = cs.groupBy("source").agg(F.sum("c").alias("ns"))
    ct = cs.groupBy("b").agg(F.sum("c").alias("ctb"))
    nt = ct.agg(F.sum("ctb").alias("nt"))

    spark = d.sparkSession
    grid = (
        ns.select("source")
        .crossJoin(
            F.broadcast(
                spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))
            )
        )
        .join(cs, ["source", "b"], "left")
        .join(F.broadcast(ct), "b", "left")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nt))
    )
    denom = F.lit(alpha) * F.lit(DSIR_BUCKETS)
    ps = (F.coalesce(F.col("c").cast("double"), F.lit(0.0)) + alpha) / (F.col("ns") + denom)
    pc = (F.coalesce(F.col("ctb").cast("double"), F.lit(0.0)) + alpha) / (F.col("nt") + denom)
    m = (ps + pc) / F.lit(2.0)
    term = ps * F.log(ps / m) + pc * F.log(pc / m)
    return (
        grid.groupBy("source")
        .agg(
            F.first("ns").alias("n_feats"),
            F.round(F.lit(0.5) * F.sum(term), 6).alias("js_divergence"),
        )
        .select("source", F.col("n_feats").cast("long").alias("n_feats"), "js_divergence")
    )


def docs_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: per-source JS divergence from the corpus blend
    over ``documents``."""
    return source_divergence(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )


_SOURCE_DIVERGENCE_SQL = f"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
feats AS (
  SELECT source, CAST('0x' || substring(md5(f), 1, 15) AS BIGINT) % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, source, unnest(t) AS f FROM base
    UNION ALL
    SELECT doc_id, source, t[i] || ' ' || t[i+1] AS f
    FROM base, unnest(range(1, len(t))) AS u(i)
  )
),
cs AS (SELECT source, b, COUNT(*) AS c FROM feats GROUP BY source, b),
ns AS (SELECT source, SUM(c) AS ns FROM cs GROUP BY source),
ct AS (SELECT b, SUM(c) AS ctb FROM cs GROUP BY b),
nt AS (SELECT SUM(ctb) AS nt FROM ct),
grid AS (
  SELECT s.source, g.b, cs.c, ct.ctb, s.ns, nt.nt
  FROM ns s
  CROSS JOIN (SELECT unnest(range(0, {DSIR_BUCKETS})) AS b) g
  LEFT JOIN cs ON cs.source = s.source AND cs.b = g.b
  LEFT JOIN ct ON ct.b = g.b
  CROSS JOIN nt
),
terms AS (
  SELECT source, ns,
         ((COALESCE(c, 0) + {DSIR_ALPHA}) / (ns + {DSIR_ALPHA} * {DSIR_BUCKETS})) AS ps,
         ((COALESCE(ctb, 0) + {DSIR_ALPHA}) / (nt + {DSIR_ALPHA} * {DSIR_BUCKETS})) AS pc
  FROM grid
)
SELECT source, CAST(MIN(ns) AS BIGINT) AS n_feats,
       ROUND(0.5 * SUM(ps * ln(ps / ((ps + pc) / 2.0))
                     + pc * ln(pc / ((ps + pc) / 2.0))), 6) AS js_divergence
FROM terms
GROUP BY source
"""

PYTEST_ORACLES["docs_source_divergence"] = (docs_source_divergence, _SOURCE_DIVERGENCE_SQL)


# -- persisted importance-weight tables ----------------------------------------


def persist_dsir_tables(
    spark: SparkSession,
    model_dir: str,
    d: DataFrame,
    target_source: str | None = None,
    alpha: float = DSIR_ALPHA,
) -> None:
    """Fit DSIR's target/raw hashed-feature distributions ONCE and persist
    them (the ``persist_quality_model`` discipline): a production pipeline
    estimates p (trusted slice) and q (raw pool) on a fixed snapshot and
    scores every later crawl batch against those FROZEN tables — refitting
    per batch silently shifts every weight as the pool grows.

    Layout: ``/tables`` (b, cp, cq — bucket-space-sized raw counts),
    ``/meta`` (1 row: np, nq totals + alpha)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", toks.alias("t"))
    if target_source is None:
        ms = base.agg(F.min("source").alias("source"))
        tgt = base.join(F.broadcast(ms), "source", "left_semi")
    else:
        tgt = base.filter(F.col("source") == target_source)
    docf = (
        _doc_features(base)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    q_tab = docf.groupBy("b").agg(F.sum("c").alias("cq"))
    p_tab = (
        docf.join(tgt.select("doc_id"), "doc_id", "left_semi")
        .groupBy("b")
        .agg(F.sum("c").alias("cp"))
    )
    tables = q_tab.join(p_tab, "b", "left").select(
        "b", F.coalesce("cp", F.lit(0)).alias("cp"), "cq"
    )
    tables.write.mode("overwrite").parquet(model_dir + "/tables")
    (
        spark.read.parquet(model_dir + "/tables")
        .agg(
            F.sum("cp").alias("np"),
            F.sum("cq").alias("nq"),
            F.lit(float(alpha)).alias("alpha"),
        )
        .write.mode("overwrite")
        .parquet(model_dir + "/meta")
    )


def dsir_score_batch(
    spark: SparkSession, model_dir: str, new_docs: DataFrame
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, logw, score) under the
    FROZEN tables: one batch feature pass + a broadcast join against the
    bucket-space-sized count table; features unseen at fit time fall back
    to the smoothed zero-count ratio. ``score`` is the Gumbel-perturbed
    weight ``dsir_select`` orders by, so a caller can take its own top-k
    across accumulated batches. Scoring the fit corpus itself reproduces
    ``dsir_select``'s logw/score columns row-for-row (tested)."""
    meta = spark.read.parquet(model_dir + "/meta").first()
    alpha = meta["alpha"]
    tab = spark.read.parquet(model_dir + "/tables")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = new_docs.select("doc_id", "source", toks.alias("t"))
    docf = _doc_features(base).groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    denom = F.lit(alpha) * F.lit(DSIR_BUCKETS)
    lp = F.log(
        (F.coalesce(F.col("cp").cast("double"), F.lit(0.0)) + alpha)
        / (F.lit(float(meta["np"])) + denom)
    )
    lq = F.log(
        (F.coalesce(F.col("cq").cast("double"), F.lit(0.0)) + alpha)
        / (F.lit(float(meta["nq"])) + denom)
    )
    logw = (
        docf.join(F.broadcast(tab), "b", "left")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * (lp - lq)), 6).alias("logw"))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(_TWO60)
    gumbel = -F.log(-F.log(u))
    return (
        base.select("doc_id", "source")
        .join(logw, "doc_id")
        .withColumn("score", F.round(F.col("logw") + gumbel, 6))
    )
