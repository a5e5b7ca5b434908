"""Cluster-representative selection — behavior tests (oracle parity in
test_oracle.py via PYTEST_ORACLES['dedup_keep_best'])."""

SF = "/root/testdata/sf0.001"


def test_exactly_one_keeper_per_cluster(spark):
    from artan_spark.plans.dedup import dedup_keep_best

    rows = dedup_keep_best(spark, SF).collect()
    assert rows, "corpus has near-dup clusters; keep_best must be non-vacuous"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, members in by_cluster.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, f"cluster {cl}: {len(keepers)} keepers"
        best = keepers[0]
        # the keeper has the max rounded score; ties break to smallest id
        for m in members:
            assert (m["quality_score"], -m["doc_id"]) <= (
                best["quality_score"],
                -best["doc_id"],
            )


def test_membership_matches_dedup_clusters(spark):
    """keep_best scores exactly the docs dedup_clusters clusters — same
    label core, no drift between the two views."""
    from artan_spark.plans.dedup import dedup_clusters, dedup_keep_best

    kb_docs = {r["doc_id"] for r in dedup_keep_best(spark, SF).collect()}
    members = set()
    for r in dedup_clusters(spark, SF).collect():
        members |= {int(x) for x in r["members"].split(",")}
    assert kb_docs == members


def test_docsets_and_labels_are_session_memoized(spark):
    """The per-doc shingle-set tier and the propagated component labels are
    fit ONCE per (session, documents path, freshness token): the four
    registry entries built on them (jaccard, clusters, keep_best,
    clean_stats) reuse the identical checkpointed frames — the
    _NB_DOCF_CACHE / _NORM_CACHE contract applied to the dedup core. The
    ENTRY results (self-join, filter, aggregation, scoring) still compute
    per invocation — only the shared corpus statistic is memoized."""
    import artan_spark.plans.dedup as dd

    dd._DOCSETS_CACHE.clear()
    dd._CLUSTER_LABELS_CACHE.clear()
    first = {(r.doc_a, r.doc_b): r.jaccard for r in dd.dedup_ngram_jaccard(spark, SF).collect()}
    assert len(dd._DOCSETS_CACHE) == 1
    ((dk, docsets_ckpt),) = dd._DOCSETS_CACHE.items()

    dd.dedup_clusters(spark, SF).count()
    assert dd._DOCSETS_CACHE[dk] is docsets_ckpt  # shingle tier reused
    assert len(dd._CLUSTER_LABELS_CACHE) == 1
    ((lk, labels_ckpt),) = dd._CLUSTER_LABELS_CACHE.items()

    dd.dedup_keep_best(spark, SF).count()
    assert dd._CLUSTER_LABELS_CACHE[lk] is labels_ckpt  # labels reused
    assert len(dd._DOCSETS_CACHE) == 1
    assert len(dd._CLUSTER_LABELS_CACHE) == 1

    # a repeat invocation recomputes its result from the memoized tier
    # and lands on the identical pair set
    again = {(r.doc_a, r.doc_b): r.jaccard for r in dd.dedup_ngram_jaccard(spark, SF).collect()}
    assert again == first
