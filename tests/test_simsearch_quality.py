"""ANN quality floors vs brute force (deterministic corpus, exact floors).

Measured context: the synthetic embeddings are weakly similar (max pairwise
cosine ~0.51) and the `label` column is NOT a metric clustering, so:
- multi-table OR-amplified LSH reaches ~0.84 recall (a single 6-plane table
  measured 0.06 — the reason the implementation is multi-table);
- probe-1 IVF over label cells is near-chance (~0.12) BY CONSTRUCTION of
  this corpus; the floor only guards the plumbing, and the structure is the
  point (on real clustered embeddings the same plan recalls within-cell
  neighbors).
"""

from artan_spark.plans.simsearch import TOP_K, ann_cosine_topk, ann_ivf_topk, ann_lsh_cosine

SF_DIR = "/root/testdata/sf0.01"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ann_recall_floors(spark):
    exact = _topk_sets(ann_cosine_topk(spark, SF_DIR))
    lsh = _topk_sets(ann_lsh_cosine(spark, SF_DIR))
    ivf = _topk_sets(ann_ivf_topk(spark, SF_DIR))
    n_q = len(exact)
    assert n_q == 10

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
        return hits / (n_q * TOP_K)

    assert recall(lsh) >= 0.6, recall(lsh)
    assert recall(ivf) >= 0.1, recall(ivf)
    assert all(len(v) <= TOP_K for v in lsh.values())
    assert all(len(v) <= TOP_K for v in ivf.values())


def test_ivf_kmeans_recall_and_nprobe_dial(spark):
    """The k-means coarse quantizer must beat label cells decisively, and
    recall must be monotone in nprobe (the IVF dial). Floors are measured
    values minus margin on this weakly-clustered corpus: kmeans nprobe=2
    ~0.84 (vs label-cell ~0.12), nprobe=6 ~0.9+."""
    from artan_spark.plans.simsearch import ann_ivf_kmeans

    exact = _topk_sets(ann_cosine_topk(spark, SF_DIR))
    n_q = len(exact)

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
        return hits / (n_q * TOP_K)

    r_label = recall(_topk_sets(ann_ivf_topk(spark, SF_DIR, nprobe=2)))
    r2 = recall(_topk_sets(ann_ivf_kmeans(spark, SF_DIR, nprobe=2)))
    r6 = recall(_topk_sets(ann_ivf_kmeans(spark, SF_DIR, nprobe=6)))
    assert r2 >= 0.7, r2
    assert r2 >= r_label + 0.3, (r2, r_label)
    assert r6 >= max(r2, 0.85), (r6, r2)
