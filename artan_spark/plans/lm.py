"""CCNet-style language-model perplexity filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data"
— public) re-expressed Spark-first.

CCNet scores every document's perplexity under a language model trained on
a trusted reference corpus (they use a KenLM 5-gram on Wikipedia), then
splits each language into equal-mass HEAD / MIDDLE / TAIL buckets by
perplexity — head being closest to the reference distribution. Training
pipelines then keep head+middle (or reweight by bucket).

This implementation trains a BIGRAM model with stupid backoff (Brants et
al. 2007, "Large Language Models in Machine Translation" — the published
score used at exactly this kind of corpus scale because it needs no
discount fitting, only counts):

    p(w | v) = c(vw) / c(v)                 if c(vw) > 0
             = BACKOFF * p_uni(w)           otherwise
    p_uni(w) = c(w) / N                     if c(w) > 0
             = OOV_ALPHA / N                otherwise (OOV floor)

and the first token of a document is scored by ``p_uni`` alone. Perplexity
is ``exp(-mean ln p)``. Buckets are per-source equal-thirds by RANK
(ordered by rounded perplexity with doc_id tie-break) — rank bucketing is
integer-exact and therefore bit-portable across engines, unlike
interpolated tertile thresholds whose last-ulp drift could flip boundary
docs (the reference slice here stands in for CCNet's per-language split).

The reference engine (ozancicek/artan) has no counterpart; this extends
the corpus-curation surface next to the Gopher gates
(plans/textstats.py) and the per-source token cap (plans/sampling.py).

100-TB shape:
- the model tables are VOCABULARY-sized (unigrams) and ref-bigram-sized —
  the reference slice is a small curated subset by construction (CCNet's
  is one Wikipedia), so both aggregate partial-first and are left to
  size-based planning for the scoring joins (broadcast when they fit,
  shuffled join otherwise — the ``text_unigram_logprob`` precedent);
- the token stream is exploded once and scored row-by-row with three
  equi-joins + one per-doc agg; no corpus-squared term, no Python rows;
- the bucket window shuffles the per-DOC frame (one row per doc, tiny
  next to the token stream) on ``source``;
- the reference-source selection is a broadcast 1-row semi-join, so plan
  construction stays fully lazy (no driver-side collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artan_spark.sources import read_table, read_table_wide

BACKOFF = 0.4  # stupid-backoff constant (Brants et al. 2007 use 0.4)
OOV_ALPHA = 0.5  # OOV unigram floor numerator: p = OOV_ALPHA / N

_BUCKETS = ("head", "middle", "tail")


def lm_perplexity_buckets(
    d: DataFrame,
    ref_source: str | None = None,
    backoff: float = BACKOFF,
    oov_alpha: float = OOV_ALPHA,
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, ppl, n_tokens, bucket).

    ``ref_source`` names the reference slice the model is trained on;
    ``None`` (default) trains on the lexicographically-smallest source —
    deterministic for any corpus without a driver-side collect.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", toks.alias("t"))

    if ref_source is None:
        ms = base.agg(F.min("source").alias("source"))
        ref = base.join(F.broadcast(ms), "source", "left_semi")
    else:
        ref = base.filter(F.col("source") == ref_source)

    uni = (
        ref.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint()  # read 3x: totals + two scoring joins
    )
    tot = uni.agg(F.sum("cw").alias("n"))
    pairs = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("v"), F.element_at("t", i + 1).alias("w")
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<v:string,w:string>>)"))
    bi = (
        ref.select(F.explode(pairs).alias("p"))
        .select("p.v", "p.w")
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("cvw"))
    )

    items = F.transform(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: F.struct(
            F.when(i > 1, F.element_at("t", (i - 1).cast("int"))).alias("v"),
            F.element_at("t", i.cast("int")).alias("w"),
        ),
    )
    stream = base.select("doc_id", "source", F.explode(items).alias("s")).select(
        "doc_id", "source", "s.v", "s.w"
    )
    uw = uni.select(F.col("w"), F.col("cw"))
    uv = uni.select(F.col("w").alias("v"), F.col("cw").alias("cv"))
    sc = (
        stream.join(bi, ["v", "w"], "left")
        .join(uw, "w", "left")
        .join(uv, "v", "left")
        .crossJoin(F.broadcast(tot))
    )
    # operand order matters for bit parity with the SQL oracle: unigram is
    # coalesce(c, alpha)/N; the backed-off bigram multiplies AFTER that
    # division, exactly as the SQL parenthesizes it
    p_uni = F.coalesce(F.col("cw").cast("double"), F.lit(oov_alpha)) / F.col("n")
    p = F.when(F.col("v").isNull(), p_uni).otherwise(
        F.when(F.col("cvw").isNotNull(), F.col("cvw") / F.col("cv")).otherwise(
            F.lit(backoff) * p_uni
        )
    )
    pp = sc.groupBy("doc_id", "source").agg(
        F.round(F.exp(-F.avg(F.log(p))), 6).alias("ppl"),
        F.count(F.lit(1)).alias("n_tokens"),
    )

    wrank = Window.partitionBy("source").orderBy("ppl", "doc_id")
    wsrc = Window.partitionBy("source")
    bidx = F.floor((F.row_number().over(wrank) - 1) * 3 / F.count(F.lit(1)).over(wsrc))
    return pp.select(
        "doc_id",
        "source",
        "ppl",
        "n_tokens",
        F.element_at(F.array(*[F.lit(b) for b in _BUCKETS]), bidx.cast("int") + 1).alias(
            "bucket"
        ),
    )


def docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: bigram-LM perplexity + CCNet buckets over
    ``documents``, reference = the lexicographically-smallest source."""
    return lm_perplexity_buckets(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )


_LM_PPL_SQL = f"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
ref AS (SELECT t FROM base WHERE source = (SELECT MIN(source) FROM base)),
uni AS (SELECT w, COUNT(*) AS cw
        FROM (SELECT unnest(t) AS w FROM ref) GROUP BY w),
tot AS (SELECT SUM(cw) AS n FROM uni),
bi AS (SELECT v, w, COUNT(*) AS cvw
       FROM (SELECT t[i] AS v, t[i+1] AS w
             FROM ref, unnest(range(1, len(t))) AS u(i))
       GROUP BY v, w),
stream AS (
  SELECT doc_id, source, CASE WHEN i > 1 THEN t[i-1] END AS v, t[i] AS w
  FROM base, unnest(range(1, len(t) + 1)) AS u(i)
),
scored AS (
  SELECT s.doc_id, s.source,
         CASE
           WHEN s.v IS NULL THEN COALESCE(uw.cw, {OOV_ALPHA}) / tot.n
           WHEN b.cvw IS NOT NULL THEN b.cvw / uv.cw
           ELSE {BACKOFF} * (COALESCE(uw.cw, {OOV_ALPHA}) / tot.n)
         END AS p
  FROM stream s
  LEFT JOIN bi b ON s.v = b.v AND s.w = b.w
  LEFT JOIN uni uw ON s.w = uw.w
  LEFT JOIN uni uv ON s.v = uv.w
  CROSS JOIN tot
),
pp AS (SELECT doc_id, source, ROUND(exp(-AVG(ln(p))), 6) AS ppl,
              COUNT(*) AS n_tokens
       FROM scored GROUP BY doc_id, source)
SELECT doc_id, source, ppl, n_tokens,
       ['head', 'middle', 'tail'][
         CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY source ORDER BY ppl, doc_id) - 1) * 3
                    / (COUNT(*) OVER (PARTITION BY source))) AS INT) + 1] AS bucket
FROM pp
"""


# -- interpolated Kneser-Ney ---------------------------------------------------
#
# The discount-smoothed counterpart of stupid backoff (Kneser & Ney 1995;
# Chen & Goodman 1999's interpolated form with a fixed discount — the
# smoothing KenLM itself implements, so this is the closer match to CCNet's
# actual scorer):
#
#     p_kn(w | v) = max(c(vw) - D, 0) / c(v•)  +  lam(v) * p_cont(w)
#     lam(v)      = D * N1+(v•) / c(v•)
#     p_cont(w)   = N1+(•w) / N1+(••)       (continuation probability)
#
# with c(v•) = sum_w c(vw) (v's count AS CONTEXT), N1+ the distinct-
# continuation counts, and two floors that keep every log finite: a token
# never seen as a continuation gets OOV_ALPHA / N1+(••), and a context the
# reference never saw falls back to p_cont alone. First tokens score by
# p_cont (the standard KN unigram). All counts are exact integers and both
# engines parenthesize the float arithmetic identically, so the oracle
# needs only the usual 6dp perplexity round.

KN_DISCOUNT = 0.75  # Chen & Goodman's fixed D for the non-estimated variant


def kn_perplexity_buckets(
    d: DataFrame,
    ref_source: str | None = None,
    discount: float = KN_DISCOUNT,
    oov_alpha: float = OOV_ALPHA,
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, ppl, n_tokens, bucket)
    under interpolated Kneser-Ney. Same scale shape as the stupid-backoff
    scorer: model tables are bigram-type-sized aggregates of the reference
    slice; scoring is explode + equi-joins + one per-doc agg."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select("doc_id", "source", toks.alias("t"))

    if ref_source is None:
        ms = base.agg(F.min("source").alias("source"))
        ref = base.join(F.broadcast(ms), "source", "left_semi")
    else:
        ref = base.filter(F.col("source") == ref_source)

    pairs = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("v"), F.element_at("t", i + 1).alias("w")
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<v:string,w:string>>)"))
    bi = (
        ref.select(F.explode(pairs).alias("p"))
        .select("p.v", "p.w")
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("cvw"))
        .localCheckpoint()  # read 3x: context totals, continuation counts, scoring
    )
    ctx = bi.groupBy("v").agg(
        F.sum("cvw").alias("cv"), F.count(F.lit(1)).alias("n1v")
    )
    cont = bi.groupBy("w").agg(F.count(F.lit(1)).alias("n1w"))
    n1tot = bi.agg(F.count(F.lit(1)).alias("n1tot"))

    items = F.transform(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: F.struct(
            F.when(i > 1, F.element_at("t", (i - 1).cast("int"))).alias("v"),
            F.element_at("t", i.cast("int")).alias("w"),
        ),
    )
    stream = base.select("doc_id", "source", F.explode(items).alias("s")).select(
        "doc_id", "source", "s.v", "s.w"
    )
    sc = (
        stream.join(bi, ["v", "w"], "left")
        .join(ctx, "v", "left")
        .join(cont, "w", "left")
        .crossJoin(F.broadcast(n1tot))
    )
    p_cont = F.coalesce(F.col("n1w").cast("double"), F.lit(oov_alpha)) / F.col("n1tot")
    backed = (
        F.greatest(F.col("cvw").cast("double") - F.lit(discount), F.lit(0.0))
        / F.col("cv")
        + (F.lit(discount) * F.col("n1v") / F.col("cv")) * p_cont
    )
    p = F.when(F.col("v").isNull() | F.col("cv").isNull(), p_cont).otherwise(backed)
    pp = sc.groupBy("doc_id", "source").agg(
        F.round(F.exp(-F.avg(F.log(p))), 6).alias("ppl"),
        F.count(F.lit(1)).alias("n_tokens"),
    )

    wrank = Window.partitionBy("source").orderBy("ppl", "doc_id")
    wsrc = Window.partitionBy("source")
    bidx = F.floor((F.row_number().over(wrank) - 1) * 3 / F.count(F.lit(1)).over(wsrc))
    return pp.select(
        "doc_id",
        "source",
        "ppl",
        "n_tokens",
        F.element_at(F.array(*[F.lit(b) for b in _BUCKETS]), bidx.cast("int") + 1).alias(
            "bucket"
        ),
    )


def docs_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: interpolated-KN perplexity + CCNet buckets over
    ``documents``, reference = the lexicographically-smallest source."""
    return kn_perplexity_buckets(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )


_KN_PPL_SQL = f"""
WITH base AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
ref AS (SELECT t FROM base WHERE source = (SELECT MIN(source) FROM base)),
bi AS (SELECT v, w, COUNT(*) AS cvw
       FROM (SELECT t[i] AS v, t[i+1] AS w
             FROM ref, unnest(range(1, len(t))) AS u(i))
       GROUP BY v, w),
ctx AS (SELECT v, SUM(cvw) AS cv, COUNT(*) AS n1v FROM bi GROUP BY v),
cont AS (SELECT w, COUNT(*) AS n1w FROM bi GROUP BY w),
n1tot AS (SELECT COUNT(*) AS n1tot FROM bi),
stream AS (
  SELECT doc_id, source, CASE WHEN i > 1 THEN t[i-1] END AS v, t[i] AS w
  FROM base, unnest(range(1, len(t) + 1)) AS u(i)
),
scored AS (
  SELECT s.doc_id, s.source,
         CASE
           WHEN s.v IS NULL OR c.cv IS NULL
             THEN COALESCE(co.n1w, {OOV_ALPHA}) / n1tot.n1tot
           ELSE GREATEST(COALESCE(b.cvw, 0) - {KN_DISCOUNT}, 0.0) / c.cv
                + ({KN_DISCOUNT} * c.n1v / c.cv)
                  * (COALESCE(co.n1w, {OOV_ALPHA}) / n1tot.n1tot)
         END AS p
  FROM stream s
  LEFT JOIN bi b ON s.v = b.v AND s.w = b.w
  LEFT JOIN ctx c ON s.v = c.v
  LEFT JOIN cont co ON s.w = co.w
  CROSS JOIN n1tot
),
pp AS (SELECT doc_id, source, ROUND(exp(-AVG(ln(p))), 6) AS ppl,
              COUNT(*) AS n_tokens
       FROM scored GROUP BY doc_id, source)
SELECT doc_id, source, ppl, n_tokens,
       ['head', 'middle', 'tail'][
         CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY source ORDER BY ppl, doc_id) - 1) * 3
                    / (COUNT(*) OVER (PARTITION BY source))) AS INT) + 1] AS bucket
FROM pp
"""


QUERIES: dict = {}
ORACLES: dict = {}
# registry is at the driver's 50-entry cap: these queries carry their
# oracles through the pytest gate
PYTEST_ORACLES = {
    "docs_lm_perplexity": (docs_lm_perplexity, _LM_PPL_SQL),
    "docs_kn_perplexity": (docs_kn_perplexity, _KN_PPL_SQL),
}
