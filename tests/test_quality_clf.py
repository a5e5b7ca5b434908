"""NB quality classifier: planted quality split recovered, GPT-3 Pareto
keep rule replayed in plain Python, and the linear-model weights match a
closed-form numpy Naive Bayes fit. Cross-engine parity runs in
test_oracle.py (PYTEST_ORACLES)."""

import hashlib
import math

from artan_spark.plans.quality_clf import PARETO_SHAPE, QC_ALPHA, nb_quality_scores

_TWO60 = float(1 << 60)


def _mk_corpus(spark):
    """3 sources: 'a_curated' = clean prose vocab; 'web' = half clean, half
    junk; junk reuses a disjoint vocab. doc_ids interleave so the split is
    not id-correlated."""
    clean = "the quick brown fox jumps over the lazy dog near the river bank"
    junk = "zzq xxw qqz wxx zqx buy now click here zzq xxw free free free"
    rows = []
    for i in range(30):
        rows.append((i, "a_curated", clean + f" paragraph {i % 5}"))
    for i in range(30, 60):
        rows.append((i, "web", clean + f" chapter {i % 7}"))
    for i in range(60, 90):
        rows.append((i, "web", junk + f" spam {i % 3}"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_planted_quality_split_recovered(spark):
    d = _mk_corpus(spark)
    out = {r.doc_id: r for r in nb_quality_scores(d).collect()}
    assert len(out) == 90
    clean_web = [out[i].prob for i in range(30, 60)]
    junk_web = [out[i].prob for i in range(60, 90)]
    # every clean web doc outranks every junk web doc, with a real gap —
    # the split is recovered by RANK (absolute prob absorbs the 1:2 class
    # prior, so clean shared text sits just under even odds by design)
    assert min(clean_web) > max(junk_web) + 0.05
    # curated docs score above everything web (their held-out tokens match
    # the positive class)
    assert min(out[i].prob for i in range(30)) > max(clean_web)
    # the Pareto keep rule never prefers a junk doc over a clean one at the
    # same draw: among kept web docs, clean dominates (keep-rule exactness
    # is pinned bit-for-bit in test_pareto_keep_rule_replay)
    kept_clean = sum(1 for i in range(30, 60) if out[i].keep)
    kept_junk = sum(1 for i in range(60, 90) if out[i].keep)
    assert kept_clean >= kept_junk


def test_pareto_keep_rule_replay(spark):
    """keep == (prob > 1 - lomax(doc_id)) with the md5-uniform inverse-CDF
    draw — replayed bit-exact in plain Python."""
    d = _mk_corpus(spark)
    for r in nb_quality_scores(d).collect():
        u = (
            int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) + 0.5
        ) / _TWO60
        pareto = (1.0 - u) ** (-1.0 / PARETO_SHAPE) - 1.0
        # prob in the row is rounded 6dp; recompute the unrounded side of
        # the comparison from the rounded logit (margin >> 1e-6 everywhere
        # in this corpus, asserted below)
        per_feat = r.logit / max(r.n_feats, 1)
        prob = 1.0 / (1.0 + math.exp(-per_feat))
        assert abs(prob - (1.0 - pareto)) > 1e-5  # comparison not knife-edge
        assert r.keep == (prob > 1.0 - pareto)


def test_nb_weights_match_numpy_closed_form(spark):
    """The distributed fit IS multinomial NB: per-doc logits equal the
    closed-form numpy fit on the same hashed counts (same smoothing, same
    prior), to float tolerance."""
    import numpy as np

    from artan_spark.plans.dsir import DSIR_BUCKETS

    rows = [
        (0, "a_cur", "aa bb aa cc"),
        (1, "a_cur", "aa bb dd"),
        (2, "web", "zz yy zz"),
        (3, "web", "aa zz yy yy"),
        (4, "web", "bb cc aa aa"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in nb_quality_scores(d).collect()}

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

    def feats(text):
        t = text.split()
        return [bucket(x) for x in t] + [
            bucket(f"{a} {b}") for a, b in zip(t, t[1:])
        ]

    cp = np.zeros(DSIR_BUCKETS)
    cn = np.zeros(DSIR_BUCKETS)
    for doc_id, src, text in rows:
        tgt = cp if src == "a_cur" else cn
        for b in feats(text):
            tgt[b] += 1
    w = np.log((cp + QC_ALPHA) / (cp.sum() + QC_ALPHA * DSIR_BUCKETS)) - np.log(
        (cn + QC_ALPHA) / (cn.sum() + QC_ALPHA * DSIR_BUCKETS)
    )
    bias = math.log(2) - math.log(3)
    for doc_id, _src, text in rows:
        logit = bias + sum(w[b] for b in feats(text))
        assert abs(got[doc_id].logit - round(logit, 6)) < 2e-6, (doc_id, logit)


def test_persisted_model_scores_match_inline(spark, tmp_path):
    """Model trained on the full corpus, then scoring the same corpus as a
    'batch', must reproduce nb_quality_scores row-for-row (every trained
    bucket present -> no smoothing fallback divergence)."""
    from artan_spark.plans.quality_clf import (
        persist_quality_model,
        score_with_quality_model,
    )

    d = _mk_corpus(spark)
    md = str(tmp_path / "qm")
    persist_quality_model(spark, md, d)
    inline = {r.doc_id: r for r in nb_quality_scores(d).collect()}
    stored = {r.doc_id: r for r in score_with_quality_model(spark, md, d).collect()}
    assert set(inline) == set(stored)
    for i in inline:
        assert inline[i].asDict() == stored[i].asDict(), i


def test_persisted_model_is_frozen(spark, tmp_path):
    """Scoring is stateless against the stored statistics: a doc scores
    identically across separate batch calls, and an unseen-vocabulary doc
    falls back to the smoothed zero-count weight instead of erroring."""
    from artan_spark.plans.quality_clf import (
        persist_quality_model,
        score_with_quality_model,
    )

    d = _mk_corpus(spark)
    md = str(tmp_path / "qm2")
    persist_quality_model(spark, md, d)
    novel = spark.createDataFrame(
        [(1000, "later", "the quick brown fox jumps over the lazy dog"),
         (1001, "later", "zzq xxw qqz buy now click here free free zzq"),
         (1002, "later", "xyzzy plugh qwop zzyzx qwop xyzzy plugh zzyzx")],
        "doc_id long, source string, text string",
    )
    a = {r.doc_id: r for r in score_with_quality_model(spark, md, novel).collect()}
    b = {r.doc_id: r for r in score_with_quality_model(spark, md, novel).collect()}
    for i in a:
        assert a[i].asDict() == b[i].asDict()
    # clean-vocab doc outranks the junk-vocab doc under the frozen model
    assert a[1000].prob > a[1001].prob
    # a fully-UNSEEN-vocab doc scores without error: every bucket falls
    # back to the smoothed zero-count weight ln((nn+aB)/(np+aB)) — which
    # deliberately leans toward the SMALLER class total (standard NB
    # smoothing; here curated < crawl, so unseen text reads mildly
    # curated-ish rather than junk)
    assert a[1002].n_feats > 0 and 0.0 < a[1002].prob < 1.0
    assert a[1002].prob > a[1001].prob  # still above trained junk


def test_curation_quality_stage_constrains(spark):
    """corpus_curation_with_quality == corpus_curation_with_urls with the
    head-bucket semi-join inserted: per-source kept counts can only shrink,
    and the stage is non-vacuous (it drops something at sf0.001). sf0.01
    parity runs in test_oracle.py."""
    from artan_spark.plans.pipeline import (
        corpus_curation_with_quality,
        corpus_curation_with_urls,
    )

    sf = "/root/testdata/sf0.001"
    base = {r.source: r for r in corpus_curation_with_urls(spark, sf).collect()}
    qual = {r.source: r for r in corpus_curation_with_quality(spark, sf).collect()}
    assert set(qual) <= set(base)  # a source can vanish, never appear
    for s, r in qual.items():
        assert r.n_docs_kept <= base[s].n_docs_kept
        assert r.n_tokens_kept <= base[s].n_tokens_kept
    assert sum(r.n_docs_kept for r in qual.values()) < sum(
        r.n_docs_kept for r in base.values()
    )


def test_rowwise_scoring_matches_join_path_and_streams(spark, tmp_path):
    """The stateless row-wise scorer equals the join-path scorer (up to
    summation order at 6dp), and — being a pure projection over a
    stream-static broadcast — replays over a chunked stream identically
    to its own batch run (live-ingest quality scoring)."""
    from artan_spark.plans.quality_clf import (
        persist_quality_model,
        score_rowwise_with_quality_model,
        score_with_quality_model,
    )
    from artan_spark.streaming import stream_transform

    d = _mk_corpus(spark)
    md = str(tmp_path / "qm3")
    persist_quality_model(spark, md, d)

    join_path = {r.doc_id: r for r in score_with_quality_model(spark, md, d).collect()}
    row_path = {
        r.doc_id: r for r in score_rowwise_with_quality_model(spark, md, d).collect()
    }
    assert set(join_path) == set(row_path)
    for i in join_path:
        a, b = join_path[i], row_path[i]
        assert a.n_feats == b.n_feats
        assert abs(a.logit - b.logit) <= 2e-6, i  # summation-order ulp at 6dp
        assert abs(a.prob - b.prob) <= 2e-6, i
        assert a.keep == b.keep, i

    streamed = stream_transform(
        spark,
        d,
        lambda df: score_rowwise_with_quality_model(spark, md, df),
        chunk_rows=17,
    )
    got = {r.doc_id: r for r in streamed.collect()}
    assert set(got) == set(row_path)
    for i in got:
        assert got[i].asDict() == row_path[i].asDict(), i


def test_nb_fit_is_session_memoized(spark):
    """The classifier's corpus feature pass runs ONCE per (session,
    documents path, freshness token): a second entry over the same lake
    reuses the identical checkpointed (doc, bucket) frame — the
    _KMEANS_CACHE contract applied to the NB fit."""
    from conftest import SF_DIR

    from artan_spark.plans.quality_clf import (
        _NB_DOCF_CACHE,
        _nb_memo_key,
        docs_domain_quality,
        docs_quality_classifier,
    )

    _NB_DOCF_CACHE.clear()
    docs_quality_classifier(spark, SF_DIR).count()
    key = _nb_memo_key(spark, SF_DIR)
    assert key in _NB_DOCF_CACHE
    ckpt = _NB_DOCF_CACHE[key]
    # domain report runs TWO score passes (scores + head ids): both must
    # hit the same cached fit, and the cache must not grow
    docs_domain_quality(spark, SF_DIR).count()
    assert _NB_DOCF_CACHE[key] is ckpt
    assert len(_NB_DOCF_CACHE) == 1

    # DSIR's (doc, bucket) statistic is the SAME fit (same _doc_features,
    # same aggregation) — the dsir entry shares the cache across families
    from artan_spark.plans.dsir import docs_dsir_select

    docs_dsir_select(spark, SF_DIR).count()
    assert _NB_DOCF_CACHE[key] is ckpt
    assert len(_NB_DOCF_CACHE) == 1
