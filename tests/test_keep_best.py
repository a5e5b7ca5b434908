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
