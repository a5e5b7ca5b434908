"""Model-based quality classifier — the curation stage the GPT-3 / LLaMA /
CCNet pipelines run AFTER the heuristic gates: train a linear classifier to
separate a small trusted ("curated") slice from the raw crawl, score every
document, and keep docs whose score survives a Pareto-noise threshold
(Brown et al. 2020, "Language Models are Few-Shot Learners", Appendix A;
Wenzek et al. 2020, "CCNet", §4.3; Touvron et al. 2023, LLaMA §2).

Model: multinomial Naive Bayes over hashed unigram+bigram features — the
same feature map as DSIR (``plans/dsir.py``; CCNet hashes into a fixed
bucket space the same way). NB **is** a linear classifier with a
closed-form, summation-order-free fit: the per-bucket weight is

    w[b] = ln P(b | curated) - ln P(b | crawl)          (add-alpha both)
    bias = ln P(curated) - ln P(crawl)                   (doc-count prior)

and a document's logit is ``bias + sum_b count_x[b] * w[b]``. No iterative
optimizer, no learning-rate schedule — every quantity is an integer-count
ratio, so the fit is exactly reproducible and (unlike an SGD logreg)
expressible as four GROUP BYs in ANSI SQL, which is what makes the whole
stage DuckDB-oracle-able like DSIR's log-weights.

Selection follows GPT-3's documented rule: keep a document iff

    prob > 1 - pareto_draw,   pareto_draw ~ Lomax(PARETO_SHAPE)

where ``prob`` is the LENGTH-NORMALIZED logit squashed through a sigmoid
(the raw logit grows linearly in document length and saturates any
threshold; per-feature normalization is the standard fix). The Pareto draw
is derandomized the way every sampler in ``plans/sampling.py`` is: the
60-bit md5 prefix of ``doc_id`` gives u in (0,1), and
``(1-u)^(-1/shape) - 1`` is the inverse-CDF Lomax draw — deterministic,
portable, cross-engine.

The reference engine (ozancicek/artan) has no counterpart; beyond-reference
surface next to the Gopher/C4 heuristic gates and DSIR.

100-TB shape (the DSIR contract, one corpus pass):
- per-(doc, bucket) counts are the sufficient statistic: ONE explode +
  hash-agg, localCheckpoint'd, reused for the class tables AND the scores;
- the class-conditional tables are BUCKET-sized (4096 rows) and broadcast
  by size into the scoring join; totals are 1-row broadcast aggregates;
- scoring is a narrow join + one per-doc SUM — no second pass over text,
  no driver-side fit, no collect of anything corpus-sized.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.dsir import DSIR_BUCKETS, _bucket, _doc_features
from artan_spark.sources import read_table_wide

QC_ALPHA = 0.5  # add-alpha smoothing for both class-conditional tables
PARETO_SHAPE = 9.0  # GPT-3 Appendix A: np.random.pareto(9)
# broadcast the curated id set only below this row count (the
# DSIR_BROADCAST_LIMIT / pipeline.BROADCAST_LOSER_LIMIT convention) —
# above it, plain shuffled joins (the id set is narrow either way)
QC_BROADCAST_LIMIT = 2_000_000

_TWO60 = float(1 << 60)


# session memo for the classifier's corpus feature pass: the checkpointed
# (doc_id, bucket, count) frame is independent of curated_source/alpha, so
# one fit serves docs_quality_classifier + docs_domain_quality (which runs
# TWO score passes) + the curation pipeline in one session — the same
# (appId, path, freshness-token) contract as simsearch's _KMEANS_CACHE
_NB_DOCF_CACHE: dict[tuple, DataFrame] = {}


def _nb_memo_key(spark: SparkSession, sf_dir: str) -> tuple:
    from artan_spark.sources import _path_token

    path = os.path.join(sf_dir, "documents.parquet")
    return (spark.sparkContext.applicationId, path, _path_token(path))


def _nb_evict_stale(key: tuple) -> None:
    for stale in [kk for kk in _NB_DOCF_CACHE if kk[:2] == key[:2] and kk != key]:
        del _NB_DOCF_CACHE[stale]


def _nb_raw_scores(
    d: DataFrame,
    curated_source: str | None = None,
    alpha: float = QC_ALPHA,
    memo_key: tuple | None = None,
) -> tuple:
    """Shared fit+score core: returns (base, scored) where scored is
    (doc_id, n_feats, raw_logit) — UNROUNDED. Consumed by the public
    formatters (``nb_quality_scores``, ``nb_head_ids``). ``memo_key``
    (from ``_nb_memo_key``) caches the checkpointed feature-count pass
    for the session; callers handing an arbitrary DataFrame leave it
    None and pay the pass."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", toks.alias("t"))

    if curated_source is None:
        ms = base.agg(F.min("source").alias("source"))
        cur_ids = base.join(F.broadcast(ms), "source", "left_semi").select("doc_id")
    else:
        cur_ids = base.filter(F.col("source") == curated_source).select("doc_id")
    # count-gate the curated-set broadcast (EAGER, the dsir convention):
    # a CCNet-style trusted slice is Wikipedia-sized, but nothing enforces
    # that — past the gate the flag joins run shuffled on the narrow ids
    cur_flag = cur_ids.withColumn("cur", F.lit(True))
    if cur_ids.count() <= QC_BROADCAST_LIMIT:
        cur_flag = F.broadcast(cur_flag)

    # ONE corpus pass: (doc, bucket) occurrence counts (the DSIR shape) —
    # session-memoized when the caller supplies a (appId, path, token) key
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
    is_cur = F.col("cur").isNotNull()
    tagged = docf.join(cur_flag, "doc_id", "left")
    # class-conditional bucket counts: bucket-space-sized (<= QC buckets)
    cls = tagged.groupBy("b").agg(
        F.sum(F.when(is_cur, F.col("c")).otherwise(F.lit(0))).alias("cp"),
        F.sum(F.when(is_cur, F.lit(0)).otherwise(F.col("c"))).alias("cn"),
    )
    tot = cls.agg(F.sum("cp").alias("np"), F.sum("cn").alias("nn"))
    # doc-count prior (1-row broadcast)
    prior = (
        base.join(cur_flag, "doc_id", "left")
        .agg(
            F.sum(F.when(is_cur, 1).otherwise(0)).alias("dp"),
            F.sum(F.when(is_cur, 0).otherwise(1)).alias("dn"),
        )
    )

    denom = F.lit(alpha) * F.lit(DSIR_BUCKETS)
    w = F.log((F.col("cp").cast("double") + alpha) / (F.col("np") + denom)) - F.log(
        (F.col("cn").cast("double") + alpha) / (F.col("nn") + denom)
    )
    scored = (
        docf.join(F.broadcast(cls), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * w).alias("dot"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "n_feats",
            (F.log(F.col("dp").cast("double")) - F.log(F.col("dn").cast("double")) + F.col("dot")).alias(
                "raw_logit"
            ),
        )
    )

    return base, scored


QC_HEAD_FRAC = 1.0 / 3.0  # CCNet §4.3: head bucket of per-corpus thirds


def nb_quality_scores(
    d: DataFrame,
    curated_source: str | None = None,
    alpha: float = QC_ALPHA,
    pareto_shape: float = PARETO_SHAPE,
    memo_key: tuple | None = None,
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, n_feats, logit, prob,
    keep): Naive-Bayes quality score against the curated slice.

    ``curated_source`` names the trusted slice (default: lexicographically
    smallest source — the ``dsir_select`` convention). ``logit`` is the
    raw NB log-odds (grows with length), ``prob`` the sigmoid of the
    per-feature logit, ``keep`` the GPT-3 Pareto-threshold decision.
    Curated docs score against their own class like any other doc (the
    GPT-3 setup scores the whole corpus with the trained model)."""
    base, scored = _nb_raw_scores(d, curated_source, alpha, memo_key)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(_TWO60)
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / pareto_shape)) - F.lit(1.0)
    per_feat = F.col("raw_logit") / F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-per_feat))
    return (
        base.select("doc_id", "source")
        .join(scored, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_feats",
            F.round("raw_logit", 6).alias("logit"),
            F.round(prob, 6).alias("prob"),
            (prob > F.lit(1.0) - pareto).alias("keep"),
        )
    )


def nb_head_ids(
    d: DataFrame,
    frac: float = QC_HEAD_FRAC,
    curated_source: str | None = None,
    alpha: float = QC_ALPHA,
    memo_key: tuple | None = None,
) -> DataFrame:
    """(doc_id) of the classifier HEAD bucket: the top ``ceil(frac * n)``
    docs by per-feature NB score — CCNet's thirds orientation (§4.3), the
    keep rule a curation pipeline composes with (the GPT-3 Pareto rule in
    ``nb_quality_scores`` is an expected-keep-rate gamble and can be
    vacuous when the curated prior is tiny; a rank bucket always keeps
    exactly its share). Deterministic cross-engine: the sort key is the
    6dp-ROUNDED per-feature logit with doc_id tie-break (the dsir_select
    top-k contract), selection is a distributed TakeOrdered."""
    import math

    base, scored = _nb_raw_scores(d, curated_source, alpha, memo_key)
    k = math.ceil(frac * base.count())  # EAGER, the dsir convention
    qs = F.round(
        F.col("raw_logit") / F.greatest(F.col("n_feats"), F.lit(1)).cast("double"), 6
    )
    return (
        scored.select("doc_id", qs.alias("qs"))
        .orderBy(F.desc("qs"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id")
    )


def persist_quality_model(
    spark: SparkSession,
    model_dir: str,
    docs: DataFrame,
    curated_source: str | None = None,
    alpha: float = QC_ALPHA,
    pareto_shape: float = PARETO_SHAPE,
) -> None:
    """Train once, serve many: materialize the NB class-conditional counts
    so daily batches score against FROZEN statistics — the
    ``build_ivf_index`` / ``build_neardup_index`` discipline applied to the
    quality stage (a production pipeline trains the classifier on a fixed
    snapshot and scores every later crawl with it; retraining per batch
    would silently shift the decision boundary between days).

    Layout: ``/counts`` (b, cp, cn — bucket-space-sized, raw counts so the
    smoothing stays explicit and a rebuild can continue from them),
    ``/meta`` (1 row: totals, doc-count prior, alpha, pareto_shape)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", "source", toks.alias("t"))
    if curated_source is None:
        ms = base.agg(F.min("source").alias("source"))
        cur_ids = base.join(F.broadcast(ms), "source", "left_semi").select("doc_id")
    else:
        cur_ids = base.filter(F.col("source") == curated_source).select("doc_id")
    cur_flag = cur_ids.withColumn("cur", F.lit(True))
    if cur_ids.count() <= QC_BROADCAST_LIMIT:
        cur_flag = F.broadcast(cur_flag)
    docf = (
        _doc_features(base)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    is_cur = F.col("cur").isNotNull()
    cls = (
        docf.join(cur_flag, "doc_id", "left")
        .groupBy("b")
        .agg(
            F.sum(F.when(is_cur, F.col("c")).otherwise(F.lit(0))).alias("cp"),
            F.sum(F.when(is_cur, F.lit(0)).otherwise(F.col("c"))).alias("cn"),
        )
    )
    cls.write.mode("overwrite").parquet(model_dir + "/counts")
    tot = spark.read.parquet(model_dir + "/counts").agg(
        F.sum("cp").alias("np"), F.sum("cn").alias("nn")
    )
    prior = base.join(cur_flag, "doc_id", "left").agg(
        F.sum(F.when(is_cur, 1).otherwise(0)).alias("dp"),
        F.sum(F.when(is_cur, 0).otherwise(1)).alias("dn"),
    )
    (
        tot.crossJoin(prior)
        .select(
            "np", "nn", "dp", "dn",
            F.lit(float(alpha)).alias("alpha"),
            F.lit(float(pareto_shape)).alias("pareto_shape"),
        )
        .write.mode("overwrite")
        .parquet(model_dir + "/meta")
    )


def score_with_quality_model(
    spark: SparkSession, model_dir: str, new_docs: DataFrame
) -> DataFrame:
    """Score a batch under the persisted (frozen) model: same output
    contract as ``nb_quality_scores``. Features unseen at train time fall
    back to the smoothed zero-count weight (add-alpha covers the whole
    bucket space by construction). Scoring is one batch pass + a
    broadcast join against the bucket-space-sized count table — no
    retrain, no corpus read."""
    meta = spark.read.parquet(model_dir + "/meta").first()
    alpha, shape = meta["alpha"], meta["pareto_shape"]
    cls = spark.read.parquet(model_dir + "/counts")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = new_docs.select("doc_id", "source", toks.alias("t"))
    docf = _doc_features(base).groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    denom = F.lit(alpha) * F.lit(DSIR_BUCKETS)
    cp = F.coalesce(F.col("cp").cast("double"), F.lit(0.0))
    cn = F.coalesce(F.col("cn").cast("double"), F.lit(0.0))
    w = F.log((cp + alpha) / (F.lit(float(meta["np"])) + denom)) - F.log(
        (cn + alpha) / (F.lit(float(meta["nn"])) + denom)
    )
    scored = (
        docf.join(F.broadcast(cls), "b", "left")
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_feats"), F.sum(F.col("c") * w).alias("dot"))
        .select(
            "doc_id",
            "n_feats",
            (
                F.lit(math.log(float(meta["dp"])) - math.log(float(meta["dn"])))
                + F.col("dot")
            ).alias("raw_logit"),
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(_TWO60)
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / shape)) - F.lit(1.0)
    per_feat = F.col("raw_logit") / F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-per_feat))
    return (
        base.select("doc_id", "source")
        .join(scored, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_feats",
            F.round("raw_logit", 6).alias("logit"),
            F.round(prob, 6).alias("prob"),
            (prob > F.lit(1.0) - pareto).alias("keep"),
        )
    )


def quality_model_weight_row(spark: SparkSession, model_dir: str) -> DataFrame:
    """1-row frame (w array<double> of DSIR_BUCKETS, bias double,
    pareto_shape double): the persisted model flattened to a serving
    vector — smoothing applied, buckets unseen at train time filled with
    the zero-count weight. Bounded by the bucket space (4096), never the
    corpus: the one collect here is model-sized by construction."""
    meta = spark.read.parquet(model_dir + "/meta").first()
    alpha = meta["alpha"]
    np_, nn = float(meta["np"]), float(meta["nn"])
    denom = alpha * DSIR_BUCKETS
    default = math.log(alpha / (np_ + denom)) - math.log(alpha / (nn + denom))
    w = [default] * DSIR_BUCKETS
    for r in spark.read.parquet(model_dir + "/counts").collect():
        w[int(r["b"])] = math.log((float(r["cp"]) + alpha) / (np_ + denom)) - math.log(
            (float(r["cn"]) + alpha) / (nn + denom)
        )
    bias = math.log(float(meta["dp"])) - math.log(float(meta["dn"]))
    return spark.createDataFrame(
        [(w, bias, float(meta["pareto_shape"]))],
        "w array<double>, bias double, pareto_shape double",
    )


def score_rowwise_with_quality_model(
    spark: SparkSession, model_dir: str, new_docs: DataFrame
) -> DataFrame:
    """STATELESS row-wise scoring against the persisted model — the
    live-ingest serving path: the weight vector rides a broadcast 1-row
    stream-static cross join, features hash in-row, and the logit is one
    ``F.aggregate`` over the feature array. No explode, no groupBy, no
    state — the plan is a projection, so the same expression runs on a
    readStream unchanged (streaming-replay == batch, tested).

    Equals ``score_with_quality_model`` up to float summation order (the
    join path sums per-bucket partials, this path sums in feature order);
    the 6dp-rounded outputs agree except within an ulp of a rounding
    boundary."""
    w_row = quality_model_weight_row(spark, model_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    uni = toks  # exactly dsir._doc_features' token stream (no "" filter)
    big = F.when(
        F.size(uni) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(uni) - 1),
            lambda i: F.concat_ws(" ", F.element_at(uni, i), F.element_at(uni, i + 1)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    feat_strs = F.concat(uni, big)
    bucket = lambda x: (  # noqa: E731 — the dsir._bucket expression, in-row
        F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long") % DSIR_BUCKETS
    )
    feats = F.transform(feat_strs, bucket)
    logit = F.col("bias") + F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at("w", (b + 1).cast("int")),
    )
    n_feats = F.size(feats).cast("long")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + 0.5
    ) / F.lit(_TWO60)
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0) / F.col("pareto_shape")) - F.lit(1.0)
    per_feat = logit / F.greatest(n_feats, F.lit(1)).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-per_feat))
    return (
        new_docs.select("doc_id", "source", "text")
        .crossJoin(F.broadcast(w_row))
        .select(
            "doc_id",
            "source",
            n_feats.alias("n_feats"),
            F.round(logit, 6).alias("logit"),
            F.round(prob, 6).alias("prob"),
            (prob > F.lit(1.0) - pareto).alias("keep"),
        )
    )


def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: NB quality scores over ``documents``, curated
    slice = the lexicographically-smallest source."""
    return nb_quality_scores(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        memo_key=_nb_memo_key(spark, sf_dir),
    )


# Composable q-prefixed CTE block (no WITH): the standalone oracle below
# and the curation-pipeline oracle (plans/pipeline.py) share it verbatim,
# so a feature-map or smoothing change here flows into both.
_QC_KEEP_EXPR = (
    "1.0 / (1.0 + exp(-(raw_logit / GREATEST(n_feats, 1))))"
    " > 1.0 - (POW(1.0 - (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)"
    f" / {_TWO60}, -1.0 / {PARETO_SHAPE}) - 1.0)"
)

_QC_CTES = f"""qbase AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
qfeats AS (
  SELECT doc_id, CAST('0x' || substring(md5(f), 1, 15) AS BIGINT) % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, unnest(t) AS f FROM qbase
    UNION ALL
    SELECT doc_id, t[i] || ' ' || t[i+1] AS f
    FROM qbase, unnest(range(1, len(t))) AS u(i)
  )
),
qcur AS (SELECT doc_id FROM qbase WHERE source = (SELECT MIN(source) FROM qbase)),
qdocf AS (SELECT doc_id, b, COUNT(*) AS c FROM qfeats GROUP BY doc_id, b),
qcls AS (
  SELECT b,
         SUM(CASE WHEN qcur.doc_id IS NOT NULL THEN c ELSE 0 END) AS cp,
         SUM(CASE WHEN qcur.doc_id IS NULL THEN c ELSE 0 END) AS cn
  FROM qdocf LEFT JOIN qcur ON qdocf.doc_id = qcur.doc_id
  GROUP BY b
),
qtot AS (SELECT SUM(cp) AS np, SUM(cn) AS nn FROM qcls),
qprior AS (
  SELECT SUM(CASE WHEN qcur.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS dp,
         SUM(CASE WHEN qcur.doc_id IS NULL THEN 1 ELSE 0 END) AS dn
  FROM qbase LEFT JOIN qcur ON qbase.doc_id = qcur.doc_id
),
qscored AS (
  SELECT qdocf.doc_id,
         CAST(SUM(c) AS BIGINT) AS n_feats,
         ln(dp * 1.0) - ln(dn * 1.0)
         + SUM(c * (ln((cp + {QC_ALPHA}) / (np + {QC_ALPHA} * {DSIR_BUCKETS}))
                  - ln((cn + {QC_ALPHA}) / (nn + {QC_ALPHA} * {DSIR_BUCKETS})))) AS raw_logit
  FROM qdocf
  JOIN qcls USING (b)
  CROSS JOIN qtot CROSS JOIN qprior
  GROUP BY qdocf.doc_id, dp, dn
),
qkeep AS (SELECT doc_id FROM qscored WHERE {_QC_KEEP_EXPR})"""

_QUALITY_CLF_SQL = f"""
WITH {_QC_CTES}
SELECT b.doc_id, b.source, s.n_feats,
       ROUND(s.raw_logit, 6) AS logit,
       ROUND(1.0 / (1.0 + exp(-(s.raw_logit / GREATEST(s.n_feats, 1)))), 6) AS prob,
       s.doc_id IN (SELECT doc_id FROM qkeep) AS keep
FROM qbase b JOIN qscored s ON b.doc_id = s.doc_id
"""


# r11 window rotation: the NB classifier joined the driver window
QUERIES = {"docs_quality_classifier": docs_quality_classifier}
ORACLES = {"docs_quality_classifier": _QUALITY_CLF_SQL}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES: dict = {}


def _qc_head_cte(frac: float = QC_HEAD_FRAC) -> str:
    """The head-bucket CTE (requires _QC_CTES in scope): top ceil(frac*n)
    docs by 6dp-rounded per-feature score, doc_id tie-break — shared by
    the curation-pipeline oracle and the domain report oracle."""
    return f"""qhead AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROUND(raw_logit / GREATEST(n_feats, 1), 6) AS qs FROM qscored
  )
  ORDER BY qs DESC, doc_id ASC
  LIMIT (SELECT CAST(CEIL(COUNT(*) * {frac}) AS BIGINT) FROM qbase)
)"""


def docs_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(registered_domain, n_docs, avg_prob, head_rate): classifier
    quality aggregated per registered domain — the input a RefinedWeb-
    style blocklist curation reads (consistently-low domains get blocked
    wholesale, which is far cheaper than per-doc gating at crawl time).

    100-TB shape: the domain column is the pure-Catalyst URL projection
    (no text), the scores are the one-pass NB fit, and the report is one
    hash aggregate on the (doc -> domain, prob, in_head) rows — the only
    corpus-scale work is the classifier's own feature pass."""
    from artan_spark.plans.urls import docs_url_canonical
    from artan_spark.sources import read_table_wide

    dom = docs_url_canonical(spark, sf_dir).select("doc_id", "registered_domain")
    docs = read_table_wide(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    mk = _nb_memo_key(spark, sf_dir)
    scores = nb_quality_scores(docs, memo_key=mk).select("doc_id", "prob")
    head = F.broadcast(nb_head_ids(docs, memo_key=mk).withColumn("h", F.lit(1)))
    return (
        dom.join(scores, "doc_id")
        .join(head, "doc_id", "left")
        .groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("prob"), 6).alias("avg_prob"),
            F.round(F.avg(F.coalesce(F.col("h"), F.lit(0))), 6).alias("head_rate"),
        )
    )


def _domain_quality_sql() -> str:
    from artan_spark.plans.urls import _URL_CANONICAL_SQL

    return f"""
WITH {_QC_CTES},
{_qc_head_cte()},
dom AS ({_URL_CANONICAL_SQL}),
probs AS (
  SELECT s.doc_id,
         ROUND(1.0 / (1.0 + exp(-(s.raw_logit / GREATEST(s.n_feats, 1)))), 6) AS prob
  FROM qscored s
)
SELECT d.registered_domain,
       COUNT(*) AS n_docs,
       ROUND(AVG(p.prob), 6) AS avg_prob,
       ROUND(AVG(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END), 6) AS head_rate
FROM dom d
JOIN probs p ON d.doc_id = p.doc_id
LEFT JOIN qhead q ON d.doc_id = q.doc_id
GROUP BY d.registered_domain
"""


PYTEST_ORACLES["docs_domain_quality"] = (docs_domain_quality, _domain_quality_sql())
