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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artan_spark.sources import read_table, read_table_wide

BACKOFF = 0.4  # stupid-backoff constant (Brants et al. 2007 use 0.4)
OOV_ALPHA = 0.5  # OOV unigram floor numerator: p = OOV_ALPHA / N

_BUCKETS = ("head", "middle", "tail")

# session memo for the LM's reference count tables: the checkpointed
# (v=prev|null, w) item counts over the (immutable) reference slice are the
# sufficient statistic for BOTH scorers — c(w) is the w-marginal, c(vw) the
# non-null-v subset, and the KN context/continuation tables all derive from
# c(vw) — so ONE fit serves docs_lm_perplexity + docs_kn_perplexity for the
# whole session. Same (appId, path, freshness-token) contract as
# quality_clf._NB_DOCF_CACHE; the key carries ref_source because the
# statistic is a function of which slice trained it. Callers handing an
# arbitrary DataFrame leave memo_key None and pay the fit per call.
_LM_BIG0_CACHE: dict[tuple, DataFrame] = {}


def _lm_memo_key(spark: SparkSession, sf_dir: str, ref_source: str | None) -> tuple:
    from artan_spark.sources import _path_token

    path = os.path.join(sf_dir, "documents.parquet")
    return (spark.sparkContext.applicationId, path, _path_token(path), ref_source)


def _ref_item_counts(
    base: DataFrame, ref_source: str | None, memo_key: tuple | None = None
) -> DataFrame:
    """(v|null, w, cvw) counts over the reference slice — ONE reference
    pass (the pre-r12 shape scanned + exploded the reference separately per
    model table), checkpointed bigram-type-sized, optionally
    session-memoized."""
    got = _LM_BIG0_CACHE.get(memo_key) if memo_key is not None else None
    if got is not None:
        return got
    ref = _ref_slice(base, ref_source)
    items = _token_stream(ref).select("v", "w")
    big0 = items.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw")).localCheckpoint()
    if memo_key is not None:
        for stale in [kk for kk in _LM_BIG0_CACHE if kk[:2] == memo_key[:2] and kk != memo_key]:
            del _LM_BIG0_CACHE[stale]
        _LM_BIG0_CACHE[memo_key] = big0
    return big0


def _tok_base(d: DataFrame) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, t: array<string>)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select("doc_id", "source", toks.alias("t"))


def _ref_slice(base: DataFrame, ref_source: str | None) -> DataFrame:
    """The reference (training) slice: a named source, or the
    lexicographically-smallest one via a broadcast 1-row semi-join."""
    if ref_source is None:
        ms = base.agg(F.min("source").alias("source"))
        return base.join(F.broadcast(ms), "source", "left_semi")
    return base.filter(F.col("source") == ref_source)


def _pairs():
    # built lazily: F.transform's lambda needs an active SparkContext, so
    # this must NOT run at import time
    return F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("v"), F.element_at("t", i + 1).alias("w")
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<v:string,w:string>>)"))


def _items():
    return F.transform(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: F.struct(
            F.when(i > 1, F.element_at("t", (i - 1).cast("int"))).alias("v"),
            F.element_at("t", i.cast("int")).alias("w"),
        ),
    )


def _token_stream(base: DataFrame) -> DataFrame:
    """Explode docs into (doc_id, source, v=prev token|null, w=token)."""
    return base.select("doc_id", "source", F.explode(_items()).alias("s")).select(
        "doc_id", "source", "s.v", "s.w"
    )


def _bigram_counts(ref: DataFrame) -> DataFrame:
    return (
        ref.select(F.explode(_pairs()).alias("p"))
        .select("p.v", "p.w")
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("cvw"))
    )


def _unigram_counts(ref: DataFrame) -> DataFrame:
    return (
        ref.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )


def _sb_ppl(
    stream: DataFrame, uni: DataFrame, bi: DataFrame, backoff: float, oov_alpha: float
) -> DataFrame:
    """Stupid-backoff per-doc perplexity from count tables — shared verbatim
    between the inline scorer and the frozen-store serving path so the two
    are bit-identical by construction."""
    tot = uni.agg(F.sum("cw").alias("n"))
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
    return sc.groupBy("doc_id", "source").agg(
        F.round(F.exp(-F.avg(F.log(p))), 6).alias("ppl"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def _kn_ppl(
    stream: DataFrame, bi: DataFrame, discount: float, oov_alpha: float
) -> DataFrame:
    """Interpolated-KN per-doc perplexity from the bigram count table
    (context totals, continuation counts and N1+ totals all derive from
    it) — shared between the inline scorer and the frozen-store path."""
    ctx = bi.groupBy("v").agg(F.sum("cvw").alias("cv"), F.count(F.lit(1)).alias("n1v"))
    cont = bi.groupBy("w").agg(F.count(F.lit(1)).alias("n1w"))
    n1tot = bi.agg(F.count(F.lit(1)).alias("n1tot"))
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
    return sc.groupBy("doc_id", "source").agg(
        F.round(F.exp(-F.avg(F.log(p))), 6).alias("ppl"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def _rank_buckets(pp: DataFrame) -> DataFrame:
    """Per-source equal-thirds rank buckets over (doc_id, source, ppl,
    n_tokens) — integer-exact, bit-portable across engines."""
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


def lm_perplexity_buckets(
    d: DataFrame,
    ref_source: str | None = None,
    backoff: float = BACKOFF,
    oov_alpha: float = OOV_ALPHA,
    memo_key: tuple | None = None,
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, ppl, n_tokens, bucket).

    ``ref_source`` names the reference slice the model is trained on;
    ``None`` (default) trains on the lexicographically-smallest source —
    deterministic for any corpus without a driver-side collect.
    """
    base = _tok_base(d)
    # ONE pass over the reference slice: the (v=prev|null, w) item counts
    # are a sufficient statistic for BOTH model tables — c(w) is the item
    # count marginal over w (every occurrence of w is the w of exactly one
    # item), and c(vw) is the non-null-v subset as-is. The pre-r12 shape
    # scanned + exploded the reference twice (unigram pass, bigram pass);
    # deriving both from one checkpointed bigram-type-sized aggregate
    # halves the reference passes (guide §2.4) with bit-identical integer
    # counts by construction.
    big0 = _ref_item_counts(base, ref_source, memo_key)
    uni = big0.groupBy("w").agg(F.sum("cvw").alias("cw"))
    bi = big0.filter(F.col("v").isNotNull())
    pp = _sb_ppl(_token_stream(base), uni, bi, backoff, oov_alpha)
    return _rank_buckets(pp)


def docs_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: bigram-LM perplexity + CCNet buckets over
    ``documents``, reference = the lexicographically-smallest source."""
    return lm_perplexity_buckets(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        memo_key=_lm_memo_key(spark, sf_dir, None),
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
    memo_key: tuple | None = None,
) -> DataFrame:
    """(doc_id, source, text) -> (doc_id, source, ppl, n_tokens, bucket)
    under interpolated Kneser-Ney. Same scale shape as the stupid-backoff
    scorer: model tables are bigram-type-sized aggregates of the reference
    slice; scoring is explode + equi-joins + one per-doc agg. The bigram
    table (read 3x inside _kn_ppl: context totals, continuation counts,
    scoring) derives from the same checkpointed item-count statistic the
    stupid-backoff scorer fits — one shared fit per session when both run."""
    base = _tok_base(d)
    bi = _ref_item_counts(base, ref_source, memo_key).filter(F.col("v").isNotNull())
    pp = _kn_ppl(_token_stream(base), bi, discount, oov_alpha)
    return _rank_buckets(pp)


def docs_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: interpolated-KN perplexity + CCNet buckets over
    ``documents``, reference = the lexicographically-smallest source."""
    return kn_perplexity_buckets(
        read_table_wide(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        memo_key=_lm_memo_key(spark, sf_dir, None),
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


# -- frozen LM store -----------------------------------------------------------
#
# Train once / score many: CCNet trains its KenLM on one fixed Wikipedia
# snapshot and scores every later CommonCrawl dump with it — retraining per
# batch would silently shift every perplexity and bucket boundary between
# days. This is the same serving discipline as build_ivf_index /
# build_neardup_index / persist_quality_model, applied to the LM stage.
#
# Layout: /unigrams (w, cw), /bigrams (v, w, cvw), /meta (1 row: params).
# The two count tables are the sufficient statistic for BOTH scorers (the
# KN context/continuation tables all derive from the bigram counts), so one
# store serves stupid-backoff and Kneser-Ney scoring. Scoring a batch is
# the SAME _sb_ppl/_kn_ppl composition the inline scorers run — stored
# model == inline model bit-for-bit by construction — and is per-doc
# independent, so daily batches are chunk-invariant.


def persist_lm(
    spark: SparkSession,
    model_dir: str,
    docs: DataFrame,
    ref_source: str | None = None,
    discount: float = KN_DISCOUNT,
    backoff: float = BACKOFF,
    oov_alpha: float = OOV_ALPHA,
) -> None:
    """Materialize the bigram-LM count tables trained on ``docs``'s
    reference slice. Both tables are reference-vocabulary-sized (the
    reference is a small curated subset by construction); the corpus is
    never written."""
    base = _tok_base(docs)
    ref = _ref_slice(base, ref_source)
    _unigram_counts(ref).write.mode("overwrite").parquet(model_dir + "/unigrams")
    _bigram_counts(ref).write.mode("overwrite").parquet(model_dir + "/bigrams")
    meta = spark.createDataFrame(
        [(float(discount), float(backoff), float(oov_alpha))],
        "discount double, backoff double, oov_alpha double",
    )
    meta.write.mode("overwrite").parquet(model_dir + "/meta")


def score_with_lm(
    spark: SparkSession,
    model_dir: str,
    new_docs: DataFrame,
    smoothing: str = "kn",
) -> DataFrame:
    """Score a batch under the persisted (frozen) LM: (doc_id, source,
    ppl, n_tokens). ``smoothing`` is ``"kn"`` (interpolated Kneser-Ney) or
    ``"sb"`` (stupid backoff). Tokens/contexts unseen at train time hit
    the scorers' OOV floors — the frozen model never learns from the
    scored batch. Per-doc output: no rank buckets (those are a corpus
    property, not a document property — rank the scored frame explicitly
    with ``_rank_buckets`` if a per-batch split is wanted)."""
    meta = spark.read.parquet(model_dir + "/meta").first()
    stream = _token_stream(_tok_base(new_docs))
    bi = spark.read.parquet(model_dir + "/bigrams")
    if smoothing == "kn":
        # read 3x inside _kn_ppl; checkpoint so the parquet scan runs once
        return _kn_ppl(stream, bi.localCheckpoint(), meta["discount"], meta["oov_alpha"])
    if smoothing == "sb":
        uni = spark.read.parquet(model_dir + "/unigrams").localCheckpoint()
        return _sb_ppl(stream, uni, bi, meta["backoff"], meta["oov_alpha"])
    raise ValueError(f"unknown smoothing {smoothing!r}: expected 'kn' or 'sb'")


LM_ROWWISE_LIMIT = 2_000_000  # count-table rows collectible to the driver


def score_rowwise_with_lm(
    spark: SparkSession,
    model_dir: str,
    new_docs: DataFrame,
    smoothing: str = "kn",
    table_limit: int = LM_ROWWISE_LIMIT,
) -> DataFrame:
    """STATELESS row-wise serving path for the frozen LM: same output
    contract as ``score_with_lm`` (doc_id, source, ppl, n_tokens), but the
    count tables are collected once (size-gated), broadcast as plain
    dicts, and each document scores inside ONE Arrow ``mapInPandas``
    batch — a pure projection with no explode, no join, no per-doc
    aggregation. Because it is a projection it runs unchanged on a
    ``readStream`` (the quality model's ``score_rowwise`` contract,
    applied to the LM stage). Parity with the join path is at the shared
    6dp ppl round (the per-token float ops are identical and ordered
    identically; only the log-sum order differs, inside the measured
    margin the strip-and-measure regime pins for ppl)."""
    import math

    import pandas as pd

    meta = spark.read.parquet(model_dir + "/meta").first()
    # ONE scan of the bigram table: the row list serves both the size gate
    # and the dict builds (the parquet was scanned 2-3x before)
    bi_list = spark.read.parquet(model_dir + "/bigrams").collect()
    n_bi = len(bi_list)
    if n_bi > table_limit:
        raise ValueError(
            f"bigram table has {n_bi} rows > table_limit={table_limit}: the "
            "broadcast dicts would tax the driver/executors — use the "
            "join-path score_with_lm for reference corpora this large, or "
            "raise table_limit explicitly"
        )
    if smoothing == "kn":
        if n_bi == 0:
            # the join path degrades to NULL ppl here; the row-wise path
            # would otherwise ZeroDivisionError inside every executor —
            # fail fast on the driver with an actionable message instead
            raise ValueError(
                "KN model has an empty bigram table (reference corpus had "
                "only single-token documents): Kneser-Ney continuation "
                "counts are undefined — retrain with multi-token docs or "
                "use smoothing='sb'"
            )
        discount, oov_alpha = meta["discount"], meta["oov_alpha"]
        cvw = {}
        cv = {}
        n1v = {}
        n1w = {}
        for r in bi_list:
            cvw[(r["v"], r["w"])] = r["cvw"]
            cv[r["v"]] = cv.get(r["v"], 0) + r["cvw"]
            n1v[r["v"]] = n1v.get(r["v"], 0) + 1
            n1w[r["w"]] = n1w.get(r["w"], 0) + 1
        n1tot = float(n_bi)
        bc = spark.sparkContext.broadcast((cvw, cv, n1v, n1w))

        def doc_ppl(text: str) -> tuple:
            d_cvw, d_cv, d_n1v, d_n1w = bc.value
            toks = _py_tokens(text)
            s = 0.0
            for i, w in enumerate(toks):
                p_cont = d_n1w.get(w, oov_alpha) / n1tot
                v = toks[i - 1] if i > 0 else None
                if v is None or v not in d_cv:
                    p = p_cont
                else:
                    c_v = d_cv[v]
                    p = max(d_cvw.get((v, w), 0.0) - discount, 0.0) / c_v + (
                        discount * d_n1v[v] / c_v
                    ) * p_cont
                s += math.log(p)
            return round(math.exp(-s / len(toks)), 6), len(toks)

    elif smoothing == "sb":
        backoff, oov_alpha = meta["backoff"], meta["oov_alpha"]
        uni_rows = spark.read.parquet(model_dir + "/unigrams").collect()
        cw = {r["w"]: r["cw"] for r in uni_rows}
        n = float(sum(cw.values()))
        cvw = {(r["v"], r["w"]): r["cvw"] for r in bi_list}
        bc = spark.sparkContext.broadcast((cw, cvw))

        def doc_ppl(text: str) -> tuple:
            d_cw, d_cvw = bc.value
            toks = _py_tokens(text)
            s = 0.0
            for i, w in enumerate(toks):
                p_uni = d_cw.get(w, oov_alpha) / n
                if i == 0:
                    p = p_uni
                else:
                    key = (toks[i - 1], w)
                    if key in d_cvw:
                        p = d_cvw[key] / d_cw[toks[i - 1]]
                    else:
                        p = backoff * p_uni
                s += math.log(p)
            return round(math.exp(-s / len(toks)), 6), len(toks)

    else:
        raise ValueError(f"unknown smoothing {smoothing!r}: expected 'kn' or 'sb'")

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            scored = [doc_ppl(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "source": pdf["source"].to_numpy(),
                    "ppl": [p for p, _ in scored],
                    "n_tokens": [k for _, k in scored],
                }
            )

    return new_docs.select("doc_id", "source", "text").mapInPandas(
        score, "doc_id long, source string, ppl double, n_tokens long"
    )


def _py_tokens(text) -> list:
    """Bit-match ``F.split(F.trim(text), r'\\s+')``, empirically pinned
    against the JVM (tests/test_lm.py::test_py_tokens_jvm_parity):

    - Spark ``trim`` strips ONLY the ASCII space 0x20 — tabs, NUL,
      \\x1c-\\x1f and Unicode spaces survive at the ends;
    - Java regex ``\\s`` (no UNICODE_CHARACTER_CLASS) is the ASCII class
      ``[ \\t\\n\\x0b\\f\\r]`` — NBSP/U+2028/U+3000 are NOT separators,
      unlike Python's Unicode-aware ``\\s``;
    - a leading separator after trim yields an empty first element, and
      the empty string splits to ``['']``."""
    import re

    t = "" if text is None else str(text)
    t = t.strip(" ")
    return re.split(r"[ \t\n\x0b\f\r]+", t) if t else [""]


# r11 window rotation: the stupid-backoff perplexity entry joined the
# driver window (the external gate had never exercised the LM family);
# the KN variant keeps its oracle in the pytest gate
# r12 window rotation: the Kneser-Ney variant joins the stupid-backoff one
# in the driver window (never hard-gate-checked before)
QUERIES = {
    "docs_lm_perplexity": docs_lm_perplexity,
    "docs_kn_perplexity": docs_kn_perplexity,
}
ORACLES = {
    "docs_lm_perplexity": _LM_PPL_SQL,
    "docs_kn_perplexity": _KN_PPL_SQL,
}
PYTEST_ORACLES = {}
