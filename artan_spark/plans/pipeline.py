"""Composed curation pipeline: the round-7/8 operators (Gopher quality gate
A1.1 + repetition gate A1.2, per-source token cap, SemDeDup semantic dedup)
fused into ONE oracle-checked query — proving the stages compose into a
single plan without extra corpus scans (each stage is separately
oracle-green; this pins the composition).

The reference engine has no counterpart; this is the `examples/
corpus_pipeline.py` composition shape made oracle-checkable."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.sampling import (
    SOURCE_CAP_SHARE,
    _TWO60_SQL,
    cap_source_share,
    n_tokens_expr,
)
from artan_spark.plans.simsearch import SEMDEDUP_THRESHOLD, _kmeans_cells_cte, dedup_semantic
from artan_spark.plans.textstats import (
    _GOPHER_FLAG_SQL,
    _gopher_m_cte,
    _gopher_rep_cte,
    gopher_quality_flags,
    gopher_repetition_flags,
)
from artan_spark.sources import read_table, widen_scan

# the driver corpus is synthetic word soup with no English function words,
# so the full 8-rule Gopher gate (incl. the 2-stop-words rule) blanks it —
# the composed query gates on the rules the corpus actually exercises
# (fail_words > 0 at every SF); the full gate is `passes_gopher` and each
# rule is individually pinned by docs_gopher_quality + its synthetic test
CURATION_RULES = ("words", "word_len", "symbols", "alpha")

# above this many semantic-dedup losers the per-executor broadcast copy
# costs more than the shuffled anti-join it avoids (same gate the line and
# substring passes use)
BROADCAST_LOSER_LIMIT = 2_000_000


# Session memo for the pipeline's checkpointed tiers (gated metadata,
# semantic-loser set, NB head ids). localCheckpoint blocks live for the
# session; without the memo every repeated invocation laid down a NEW set
# of blocks and re-ran the heavy gate — measured as monotonically GROWING
# repeat times (r11 bench: 5.3 -> 9.2 -> 28.9 s). Same (appId, path,
# freshness-token) contract as quality_clf._NB_DOCF_CACHE / simsearch's
# fit caches; stale-token entries are evicted on the next build.
_PIPE_CACHE: dict[tuple, tuple] = {}  # key -> (checkpointed DF, count|None)


def _pipe_memo(spark: SparkSession, data_path: str, tag: str, extras: tuple, build):
    from artan_spark.sources import _path_token

    key = (
        (spark.sparkContext.applicationId, data_path, tag)
        + tuple(extras)
        + (_path_token(data_path),)
    )
    hit = _PIPE_CACHE.get(key)
    if hit is None:
        hit = build()
        for stale in [k for k in _PIPE_CACHE if k[:-1] == key[:-1] and k != key]:
            del _PIPE_CACHE[stale]
        _PIPE_CACHE[key] = hit
    return hit


def _gated_meta(
    spark: SparkSession,
    sf_dir: str,
    rules: tuple = CURATION_RULES,
    url_keepers: DataFrame | None = None,
) -> DataFrame:
    """The ONE heavy corpus pass of the curation pipeline: quality gate
    (A1.1 subset) -> repetition gate (all 13 A1.2 rules) -> project to
    gated METADATA (doc_id, source, n_tokens) — everything downstream
    (cap totals, cap filter, loser anti-join, report agg) needs only
    these three columns, never the text. Exactly one documents scan
    (plan-asserted in tests)."""
    # barrier=True: the combined gate is ~25 ms/doc of interpreted HOF
    # eval, and PushDownPredicates would otherwise inline it into the
    # (1-row-group, hence SERIAL) documents scan — measured 80 s at
    # sf0.1 vs ~10 s with the gate running widened (guarded: a real
    # lake's scan yields >= cores splits, no-op there)
    d = widen_scan(
        spark,
        read_table(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        cache_key=os.path.join(sf_dir, "documents.parquet"),
        barrier=True,
    )
    if url_keepers is not None:
        # stage-1 URL dedup BEFORE the heavy gates: the keeper manifest is
        # (doc_id)-narrow, the semi-join prunes the interpreted HOF work to
        # keepers only (CCNet/RefinedWeb ordering — the URL pass needs no
        # text, so it always runs first)
        d = d.join(url_keepers, "doc_id", "left_semi")
    gate = F.lit(True)
    for r in rules:
        gate = gate & F.col(f"ok_{r}")
    gated = (
        gopher_quality_flags(d, keep=("source", "text"))
        .filter(gate)
        .select("doc_id", "source", "text")
    )
    gated = (
        gopher_repetition_flags(gated, keep=("source", "text"))
        .filter(F.col("passes_gopher_repetition"))
        .select("doc_id", "source", "text")
    )
    return gated.select("doc_id", "source", n_tokens_expr().alias("n_tokens"))


def corpus_curation_report(
    spark: SparkSession,
    sf_dir: str,
    rules: tuple = CURATION_RULES,
    max_share: float = SOURCE_CAP_SHARE,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """Gopher quality gate (A1.1 subset) -> Gopher repetition gate (all
    13 A1.2 rules) -> per-source token cap -> SemDeDup prune, end to
    end, reported as per-source (n_docs_kept, n_tokens_kept).

    Plan shape (the 100-TB contract, plan-asserted in tests):
    - the quality AND repetition gates are STATELESS projection+filters
      over ONE widened documents scan (``_gated_meta``) — no join back to
      the corpus;
    - the gated METADATA (doc_id, source, n_tokens — ~30 B/doc, three
      orders of magnitude narrower than the corpus) is localCheckpointed
      so the gate's ~25 ms/doc of interpreted HOF eval runs EXACTLY ONCE;
      the cap's totals agg + keep filter and the final anti-join all read
      the checkpoint (pre-round-8 shape re-ran the gate in every pass:
      3 heavy corpus passes, measured 80 s vs ~10 s at sf0.1). At 100 TB
      the checkpoint is corpus-count x 30 B — a manifest, not a copy of
      the data;
    - the semantic-loser set joins ``left_anti`` with a SIZE-GATED
      broadcast hint (small at the default threshold, but the threshold is
      caller-controlled and a low one makes losers a large corpus
      fraction — past the gate the join shuffles instead of forcing a
      broadcast past AQE's size check); the kept set, nearly the whole
      corpus, is never a broadcast side (the round-7
      examples/corpus_pipeline.py bug, fixed);
    - embeddings costs are the shared ``dedup_semantic`` fit (checkpointed
      internally); construction is EAGER (two localCheckpoints + the
      loser-count gate), like ``dedup_semantic``'s standalone use.
    """
    gated_meta, _ = _pipe_memo(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "gated_meta",
        (rules, False),
        lambda: (_gated_meta(spark, sf_dir, rules).localCheckpoint(), None),
    )
    return _cap_dedup_report(spark, sf_dir, gated_meta, max_share, threshold)


def _cap_dedup_report(
    spark: SparkSession,
    sf_dir: str,
    gated_meta: DataFrame,
    max_share: float,
    threshold: float,
) -> DataFrame:
    """Shared pipeline tail: per-source token cap -> size-gated SemDeDup
    anti-join -> per-source report (all over the ~30 B/doc metadata
    checkpoint, never the corpus)."""
    capped = cap_source_share(gated_meta, max_share=max_share, n_tokens_col="n_tokens")

    def build_losers():
        ck = (
            dedup_semantic(spark, sf_dir, threshold=threshold, return_losers=True)
            .select(F.col("vec_id").alias("doc_id"))
            .localCheckpoint()  # materialize once: the gate count must not re-join
        )
        return ck, ck.count()

    losers, n_losers = _pipe_memo(
        spark,
        os.path.join(sf_dir, "embeddings.parquet"),
        "semdedup_losers",
        (threshold,),
        build_losers,
    )
    # "small by construction" only holds near the default threshold — a
    # caller-supplied low threshold can make losers a large corpus fraction,
    # and a hard broadcast hint would bypass AQE's size check; gate it
    small = n_losers <= BROADCAST_LOSER_LIMIT
    final = capped.join(F.broadcast(losers) if small else losers, "doc_id", "left_anti")
    return final.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
    )


def corpus_curation_with_urls(
    spark: SparkSession,
    sf_dir: str,
    rules: tuple = CURATION_RULES,
    max_share: float = SOURCE_CAP_SHARE,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """The full published-pipeline ordering: URL-level dedup FIRST
    (stage 1 — needs no text), then the quality/repetition gates, token
    cap, and semantic prune of ``corpus_curation_report``.

    Plan shape: the keeper manifest is one narrow aggregate over a
    column-pruned (doc_id, source) scan — the heavy gated scan then
    semi-joins it so the ~25 ms/doc interpreted gate work runs on
    keepers only. Everything downstream is the shared metadata-manifest
    tail (``_cap_dedup_report``)."""
    from artan_spark.plans.urls import docs_url_dedup

    def build():
        keepers = docs_url_dedup(spark, sf_dir).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        return (
            _gated_meta(spark, sf_dir, rules, url_keepers=keepers).localCheckpoint(),
            None,
        )

    gated_meta, _ = _pipe_memo(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "gated_meta",
        (rules, True),
        build,
    )
    return _cap_dedup_report(spark, sf_dir, gated_meta, max_share, threshold)


def corpus_curation_with_quality(
    spark: SparkSession,
    sf_dir: str,
    rules: tuple = CURATION_RULES,
    max_share: float = SOURCE_CAP_SHARE,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """The COMPLETE published-pipeline shape (CCNet/GPT-3/LLaMA ordering):
    URL-level dedup (stage 1, text-free) -> Gopher quality + repetition
    gates -> model-based NB classifier HEAD bucket (CCNet §4.3 thirds —
    the rank rule; GPT-3's Pareto gamble can be vacuous when the curated
    prior is tiny) -> per-source token cap -> SemDeDup prune, reported
    per source.

    The classifier stage is inherently its OWN corpus pass (its class
    statistics must come from the FULL corpus — curated slice vs crawl —
    including docs the heuristic gates drop, the GPT-3 setup), so this
    pipeline reads text exactly twice: once for the classifier's hashed
    feature counts, once for the heuristic gates. The head-id set (at
    most n/3 ids) then semi-joins the ~30 B/doc gated metadata with the
    same count-gated broadcast the semantic-loser join uses; everything
    downstream is the shared metadata-manifest tail."""
    from artan_spark.plans.quality_clf import _nb_memo_key, nb_head_ids
    from artan_spark.plans.urls import docs_url_dedup
    from artan_spark.sources import read_table_wide

    def build_gated():
        keepers = docs_url_dedup(spark, sf_dir).select(
            F.col("keep_doc_id").alias("doc_id")
        )
        return (
            _gated_meta(spark, sf_dir, rules, url_keepers=keepers).localCheckpoint(),
            None,
        )

    docs_path = os.path.join(sf_dir, "documents.parquet")
    gated_meta, _ = _pipe_memo(spark, docs_path, "gated_meta", (rules, True), build_gated)

    def build_qhead():
        docs = read_table_wide(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        ck = nb_head_ids(
            docs, memo_key=_nb_memo_key(spark, sf_dir)
        ).localCheckpoint()  # materialize: gate must not re-run
        return ck, ck.count()

    qhead, n_qhead = _pipe_memo(spark, docs_path, "qhead", (), build_qhead)
    small = n_qhead <= BROADCAST_LOSER_LIMIT
    gated_meta = gated_meta.join(
        F.broadcast(qhead) if small else qhead, "doc_id", "left_semi"
    )
    return _cap_dedup_report(spark, sf_dir, gated_meta, max_share, threshold)


def _curation_sql(
    rules: tuple = CURATION_RULES,
    max_share: float = SOURCE_CAP_SHARE,
    threshold: float = SEMDEDUP_THRESHOLD,
    url_stage: bool = False,
    quality_stage: bool = False,
) -> str:
    # the flag predicates and metric CTE are textstats' own — a threshold
    # or tokenization tweak there flows into this composed oracle (and the
    # URL stage's derive/canonicalize CTEs are urls.py's own)
    gate = " AND ".join(_GOPHER_FLAG_SQL[r] for r in rules)
    rep_cte, rep_pass = _gopher_rep_cte(p="grp_")
    url_ctes, url_pred = "", ""
    if url_stage:
        from artan_spark.plans.urls import _CANON_SQL_EXPRS, _URL_DERIVE_SQL

        url_ctes = f""",
u AS ({_URL_DERIVE_SQL}),
uc AS (SELECT doc_id, {_CANON_SQL_EXPRS} FROM u),
ukeep AS (
  SELECT MIN(doc_id) AS doc_id FROM uc
  GROUP BY c_host || c_path ||
           CASE WHEN c_query = '' THEN '' ELSE '?' || c_query END
)"""
        url_pred = "\n            AND doc_id IN (SELECT doc_id FROM ukeep)"
    q_ctes, q_pred = "", ""
    if quality_stage:
        from artan_spark.plans.quality_clf import _QC_CTES, _qc_head_cte

        q_ctes = ",\n" + _QC_CTES + ",\n" + _qc_head_cte()
        q_pred = "\n            AND doc_id IN (SELECT doc_id FROM qhead)"
    return (
        _kmeans_cells_cte()
        + ",\n"
        + rep_cte
        + ",\n"
        + _gopher_m_cte(p="g", keep=("source",))
        + url_ctes
        + q_ctes
        + f""",
losers AS (
  SELECT DISTINCT b.vec_id
  FROM cells a
  JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
  WHERE list_dot_product(na.vn, nb.vn) >= {threshold}
),
gated AS (SELECT doc_id, source, n_words AS n_tokens FROM gm
          WHERE {gate}
            AND doc_id IN (SELECT doc_id FROM grp_flags WHERE {rep_pass}){url_pred}{q_pred}),
t AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM gated GROUP BY source),
r AS (
  SELECT source,
         LEAST(1.0, {max_share} * (SUM(src_tokens) OVER ())
                      / CAST(src_tokens AS DOUBLE)) AS rate
  FROM t
),
capped AS (
  SELECT g.doc_id, g.source, g.n_tokens
  FROM gated g JOIN r ON g.source = r.source
  WHERE (CAST(CAST('0x' || substring(md5(CAST(g.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
          / {_TWO60_SQL} < r.rate
)
SELECT source,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept
FROM capped
WHERE doc_id NOT IN (SELECT vec_id FROM losers)
GROUP BY source
"""
    )


# r11 window rotation: the composed curation pipeline joined the driver
# window; the url/quality-staged variants keep pytest oracles
QUERIES = {"corpus_curation_report": corpus_curation_report}
ORACLES = {"corpus_curation_report": _curation_sql()}
PYTEST_ORACLES = {
    "corpus_curation_with_urls": (
        corpus_curation_with_urls,
        _curation_sql(url_stage=True),
    ),
    "corpus_curation_with_quality": (
        corpus_curation_with_quality,
        _curation_sql(url_stage=True, quality_stage=True),
    ),
}
