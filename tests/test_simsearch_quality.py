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


def test_ivf_index_build_and_query_matches_inline(spark, tmp_path):
    """build_ivf_index + ann_ivf_query must reproduce ann_ivf_kmeans exactly
    (same fit, same rounding contract), and the cell-partitioned layout must
    let the probe join prune the scan (dynamic partition pruning on cid)."""
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import (
        N_QUERIES,
        _emb,
        ann_ivf_kmeans,
        ann_ivf_query,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, SF_DIR, idx)

    queries = (
        _emb(spark, SF_DIR)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("v", lambda x: x / F.col("norm")).alias("qvn"),
        )
    )
    got = ann_ivf_query(spark, idx, queries)
    want = ann_ivf_kmeans(spark, SF_DIR)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    g, w = sorted(got.collect(), key=key), sorted(want.collect(), key=key)
    assert [tuple(r) for r in g] == [tuple(r) for r in w]

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan


def test_quantized_ann_matches_exact(spark):
    """int8-quantize + rescore equals exact brute force row-for-row: the
    rescoring stage recomputes full-precision cosines, so only candidate
    membership could differ — and at rerank=4k the |error| <= scale/2
    quantization bound keeps every true top-k inside the rerank horizon."""
    from artan_spark.plans.simsearch import _emb, ann_quantized_topk, quantize_embeddings

    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ann_cosine_topk(spark, SF_DIR).collect()
    }
    quant = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ann_quantized_topk(spark, SF_DIR).collect()
    }
    assert quant == exact

    # quantization invariants: |q_i| <= 127 and |v_i - q_i*scale| <= scale/2
    e = _emb(spark, SF_DIR)
    joined = quantize_embeddings(e).join(e.select("vec_id", "v"), "vec_id").limit(50).collect()
    for r in joined:
        assert max(abs(q) for q in r.q) <= 127
        worst = max(abs(v - q * r.scale) for v, q in zip(r.v, r.q))
        assert worst <= r.scale / 2 + 1e-12


def test_quantized_ivf_index_serve_matches_full_precision(spark, tmp_path):
    """An index built with quantize=True serves candidate generation from
    the int8 cells_q layout; with a rerank horizon the exact-rescored
    results must equal the full-precision serve row-for-row."""
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import (
        N_QUERIES,
        _emb,
        ann_ivf_query,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf_q")
    build_ivf_index(spark, SF_DIR, idx, quantize=True)
    q = (
        _emb(spark, SF_DIR)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("v", lambda x: x / F.col("norm")).alias("qvn"),
        )
    )
    full = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, idx, q, nprobe=2).collect()
    }
    quant = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, idx, q, nprobe=2, rerank=20).collect()
    }
    assert quant == full
    # the quantized layout really is the smaller scan
    import os

    def tree_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    assert tree_bytes(idx + "/cells_q") < 0.55 * tree_bytes(idx + "/cells")


def test_dedup_semantic_prunes_within_cells(spark):
    """SemDeDup semantics on the driver corpus: the kept set is exactly
    {all vectors} minus vectors having a lower-id same-cell member at
    cosine >= threshold — verified against an independent in-python
    replay of the rule over the operator's own cell assignment; keeping
    is monotone in the threshold."""
    import numpy as np
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import _emb, _fit_kmeans_cells, dedup_semantic

    kept = {r.vec_id for r in dedup_semantic(spark, SF_DIR, threshold=0.32).collect()}

    # independent replay: pull cells + normalized vectors, do the pair rule
    e = (
        _emb(spark, SF_DIR)
        .select("vec_id", F.transform("v", lambda x: x / F.col("norm")).alias("vn"))
        .localCheckpoint()
    )
    _cent, member = _fit_kmeans_cells(e)
    rows = member.select("vec_id", "vn", "cid").collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cid, []).append((r.vec_id, np.array(r.vn)))
    expect = set()
    for cell, vs in by_cell.items():
        vs.sort()
        for i, (vid, v) in enumerate(vs):
            dup = any(float(v @ u) >= 0.32 for _uid, u in vs[:i])
            if not dup:
                expect.add(vid)
    assert kept == expect
    assert len(kept) < len(rows)  # the threshold actually prunes something

    # monotone: a stricter (higher) threshold keeps a superset
    kept_hi = {r.vec_id for r in dedup_semantic(spark, SF_DIR, threshold=0.45).collect()}
    assert kept <= kept_hi


def test_semantic_text_dedup_composition(spark):
    """Model-free semantic TEXT dedup: hash_embeddings over raw documents
    feeds dedup_semantic_vectors — a planted paraphrase loses to its
    lower-id original while distinct docs all survive; works on an id set
    that does NOT start at 0 (the generalized centroid init)."""
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import dedup_semantic_vectors
    from artan_spark.plans.textstats import hash_embeddings

    # 40 distinct docs (4 shared + 8 unique tokens -> pairwise cosine
    # ~4/12) + one near-paraphrase of doc 1000 (11 of 12 tokens shared ->
    # cosine ~0.92); ids offset so none are < KM_K (16) — exercises the
    # smallest-id centroid init path
    def text(i):
        uniq = " ".join(f"tok{i}_{j}" for j in range(8))
        return f"common glue words here {uniq}"

    rows = [(1000 + i, text(i)) for i in range(40)]
    rows.append((2000, rows[0][1].replace("tok0_7", "changed")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    vecs = hash_embeddings(docs).select(
        F.col("doc_id").alias("vec_id"), F.col("emb").alias("vn")
    )
    kept = {r.vec_id for r in dedup_semantic_vectors(vecs, threshold=0.9).collect()}
    assert 2000 not in kept  # the paraphrase loses to doc 1000
    assert kept == {1000 + i for i in range(40)}


def test_semdedup_k_derived_from_corpus(spark):
    """Round-8 scale contract: the cluster count is N-proportional
    (``km_k_for``), floored at KM_K so driver-scale oracles are
    untouched, and a larger self-generated corpus really does get more
    cells (pair work stays ~target_cell_size per cell, the paper's
    design point, instead of O((N/16)^2))."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import (
        KM_K,
        TARGET_CELL_SIZE,
        dedup_semantic_vectors,
        km_k_for,
    )

    # derivation: floor below KM_K * target, ceil(N/target) above it
    assert km_k_for(500) == KM_K
    assert km_k_for(KM_K * TARGET_CELL_SIZE) == KM_K
    assert km_k_for(KM_K * TARGET_CELL_SIZE + 1) == KM_K + 1
    assert km_k_for(10_000_000) == math.ceil(10_000_000 / TARGET_CELL_SIZE)

    # self-generated N=3000 spread over the unit circle with
    # target_cell_size=100: k derives to 30 and the output must actually
    # use substantially more than the old fixed 16 cells
    rng = np.random.RandomState(11)
    ang = rng.uniform(0, 2 * np.pi, 3000)
    rows = [(int(i), [float(np.cos(a)), float(np.sin(a))]) for i, a in enumerate(ang)]
    vecs = spark.createDataFrame(rows, "vec_id long, vn array<double>")
    kept = dedup_semantic_vectors(vecs, threshold=0.999999, target_cell_size=100)
    ncells = kept.select("cell").distinct().count()
    assert ncells > KM_K, f"expected > {KM_K} cells for N=3000/target=100, got {ncells}"


def test_semdedup_oversized_cell_guard(spark):
    """k-means balances nothing: all-identical vectors collapse into ONE
    cell regardless of k. The hash-sub-split guard must bound pair work
    (groups ~= max_cell_size) at the documented recall cost — one keeper
    survives PER SUB-CELL instead of one overall."""
    import math

    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import dedup_semantic_vectors

    N, max_cell = 2000, 250
    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(N)], "vec_id long, vn array<double>"
    )
    kept = dedup_semantic_vectors(
        vecs, threshold=0.9, k=4, target_cell_size=100, max_cell_size=max_cell
    )
    nsplit = math.ceil(N / max_cell)
    # deterministic expectation: one keeper per NONEMPTY hash sub-cell
    expected_groups = (
        vecs.select(F.pmod(F.xxhash64("vec_id"), F.lit(nsplit)).alias("sub"))
        .distinct()
        .count()
    )
    assert kept.count() == expected_groups > 1
    # the hash split is near-even: every sub-cell (hence every pair-join
    # group) stays well under the unsplit 2000-row cell
    group_max = (
        vecs.groupBy(F.pmod(F.xxhash64("vec_id"), F.lit(nsplit)).alias("sub"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert group_max <= 2 * max_cell

    # guard off (max_cell_size >= N): the exact paper semantics — one
    # keeper overall
    kept_all = dedup_semantic_vectors(vecs, threshold=0.9, k=4, max_cell_size=N)
    assert kept_all.count() == 1


def test_oracle_scale_contract_fails_loud(spark):
    """The driver-table wrappers are compared against DuckDB SQL that
    unrolls exactly KM_K unsplit cells. Past the contract (derived K != 16
    or an actual sub-split) the strict path must raise a CLEAR error, not
    surface as an opaque parity diff — while the non-strict core keeps
    working at any scale."""
    import pytest

    from artan_spark.plans.simsearch import (
        KM_K,
        TARGET_CELL_SIZE,
        _oracle_scale_check,
        dedup_semantic_vectors,
    )

    _oracle_scale_check(KM_K * TARGET_CELL_SIZE)  # at the bound: fine
    with pytest.raises(RuntimeError, match="scale contract"):
        _oracle_scale_check(KM_K * TARGET_CELL_SIZE + 1)

    # an actual sub-split under oracle_strict raises; the default does not
    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(400)], "vec_id long, vn array<double>"
    )
    with pytest.raises(RuntimeError, match="sub-split"):
        dedup_semantic_vectors(
            vecs, threshold=0.9, k=4, max_cell_size=50, oracle_strict=True
        )


def test_pq_ann_recall_rescore_and_replay(spark):
    """Product-quantization ANN: (a) emitted cosines are EXACT (every
    returned pair's score equals the brute-force cosine for that pair),
    (b) recall vs brute force clears a floor, (c) codes are in-range
    4-bit ints, and (d) the fit+encode is replayed bit-for-bit in plain
    Python (init = first PQ_K subvectors, Lloyd with 6-dp rounding,
    ties to the smallest code) — the closed-form oracle standing in for
    SQL, since PQ's per-subspace fit has no driver-window entry."""
    import numpy as np

    from artan_spark.plans.simsearch import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        _emb,
        _fit_pq_codebooks,
        ann_cosine_topk,
        ann_pq_topk,
        pq_encode,
    )
    from pyspark.sql import functions as F

    exact_df = ann_cosine_topk(spark, SF_DIR)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact_df.collect()}
    exact = _topk_sets(exact_df)

    pq_df = ann_pq_topk(spark, SF_DIR)
    rows = pq_df.collect()
    pq = _topk_sets(pq_df)
    n_q = len(exact)
    hits = sum(len(pq.get(q, set()) & nbrs) for q, nbrs in exact.items())
    assert hits / (n_q * TOP_K) >= 0.5, hits / (n_q * TOP_K)

    # exact-rescore property: any returned pair that brute force also
    # ranked carries the identical rounded cosine
    for r in rows:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-12, key

    # replay fit + encode in plain Python (no numpy reductions: Spark's
    # folds are left-to-right, so the replay loops are too)
    e = _emb(spark, SF_DIR)
    dim = len(e.select("v").first()["v"])
    ds = dim // PQ_M
    en = e.select("vec_id", F.transform("v", lambda x: x / F.col("norm")).alias("vn"))
    vecs = {r.vec_id: list(r.vn) for r in en.collect()}
    cb = {}  # (sub, code) -> centroid list
    for s in range(PQ_M):
        for c in range(PQ_K):
            cb[(s, c)] = vecs[c][s * ds:(s + 1) * ds]

    def d2(x, c):
        acc = 0.0
        for a, b in zip(x, c):
            acc += (a - b) * (a - b)
        return acc

    def assign_one(sv, s, cb_now):
        cands = sorted(code for (ss, code) in cb_now if ss == s)
        best, bd = None, None
        for code in cands:
            d = d2(sv, cb_now[(s, code)])
            if bd is None or d < bd:  # strict: ties keep the smaller code
                best, bd = code, d
        return best

    for _ in range(PQ_ITERS):
        sums = {}
        for vid, vn in vecs.items():
            for s in range(PQ_M):
                sv = vn[s * ds:(s + 1) * ds]
                code = assign_one(sv, s, cb)
                st = sums.setdefault((s, code), [0, [0.0] * ds])
                st[0] += 1
                for j in range(ds):
                    st[1][j] += sv[j]
        cb = {
            k: [round(t / n, 6) for t in tot] for k, (n, tot) in sums.items()
        }

    spark_cb = {(r.sub, r.code): list(r.cv)
                for r in _fit_pq_codebooks(en, dim).collect()}
    assert spark_cb.keys() == cb.keys()
    for k in cb:
        assert spark_cb[k] == cb[k], k

    spark_codes = {r.vec_id: list(r.codes)
                   for r in pq_encode(en, _fit_pq_codebooks(en, dim), dim).collect()}
    for vid, vn in vecs.items():
        expect = [assign_one(vn[s * ds:(s + 1) * ds], s, cb) for s in range(PQ_M)]
        assert spark_codes[vid] == expect, vid
        assert all(0 <= c < PQ_K for c in expect)


def test_ivfadc_recall_rescore_and_cell_confinement(spark):
    """IVFADC: (a) recall vs brute force clears a floor (measured 0.72 at
    both driver SFs on this corpus — floored at 0.6), (b) emitted scores
    are EXACT (rescore property: any returned pair brute force also ranked
    carries the identical rounded cosine), (c) every returned neighbor's
    cell is one of its query's nprobe probed cells under the SAME
    deterministic k-means fit — candidates never leak past the inverted
    file, and (d) mean-anchored residuals carry strictly less energy than
    the unit raw vectors (mean ||v - mean(cell(v))||^2 < 1, guaranteed by
    least-squares optimality of the cell mean — the decomposition IVFADC
    encodes residuals for, Jegou et al. 2011 §V.A; anchoring on the
    SPHERICAL unit centroid instead measures 1.35 > 1 on this
    weakly-clustered corpus, which is why the operator anchors on the
    unnormalized mean, as FAISS by_residual does)."""
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import (
        KM_NPROBE,
        _emb,
        _fit_kmeans_cells,
        ann_ivfadc_topk,
    )

    exact_df = ann_cosine_topk(spark, SF_DIR)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact_df.collect()}
    exact = _topk_sets(exact_df)

    rows = ann_ivfadc_topk(spark, SF_DIR).collect()
    iv = {}
    for r in rows:
        iv.setdefault(r.query_id, set()).add(r.neighbor_id)
    n_q = len(exact)
    hits = sum(len(iv.get(q, set()) & nbrs) for q, nbrs in exact.items())
    assert hits / (n_q * TOP_K) >= 0.6, hits / (n_q * TOP_K)

    for r in rows:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-12, key

    # (c) replay the fit: neighbor cells must be the neighbor's assigned
    # cell AND among the query's KM_NPROBE best cells
    en = _emb(spark, SF_DIR).select(
        "vec_id", F.transform("v", lambda x: x / F.col("norm")).alias("vn")
    ).localCheckpoint()
    cent, member = _fit_kmeans_cells(en)
    cell_of = {r.vec_id: r.cid for r in member.select("vec_id", "cid").collect()}
    cents = {r.cid: list(r.cv) for r in cent.collect()}
    vecs = {r.vec_id: list(r.vn) for r in en.collect()}

    def probed(qid):
        scored = sorted(
            ((sum(a * b for a, b in zip(vecs[qid], cv)), -cid), cid)
            for cid, cv in cents.items()
        )
        return {cid for _, cid in scored[-KM_NPROBE:]}

    for r in rows:
        assert r.cell == cell_of[r.neighbor_id], r
        assert r.cell in probed(r.query_id), r

    # (d) residual energy < raw energy: raw vn are unit vectors and the
    # anchor is the per-cell MEAN, so the mean squared residual norm is
    # the within-cell variance — strictly below 1
    dim = len(next(iter(vecs.values())))
    sums = {}
    for vid, cid in cell_of.items():
        st = sums.setdefault(cid, [0, [0.0] * dim])
        st[0] += 1
        for j, x in enumerate(vecs[vid]):
            st[1][j] += x
    mean_of = {cid: [t / n for t in tot] for cid, (n, tot) in sums.items()}
    sq = cnt = 0.0
    for vid, cid in cell_of.items():
        sq += sum((a - b) ** 2 for a, b in zip(vecs[vid], mean_of[cid]))
        cnt += 1
    assert sq / cnt < 0.95, sq / cnt


def test_ivfadc_index_serve_matches_inline(spark, tmp_path):
    """An index built with quantize="pq" serves IVFADC row-for-row equal
    to the inline ann_ivfadc_topk path (same fits, same determinism
    contract), and the PQ codes layout is the radically smaller scan."""
    import os

    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import (
        N_QUERIES,
        _emb,
        ann_ivfadc_query,
        ann_ivfadc_topk,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf_pq")
    build_ivf_index(spark, SF_DIR, idx, quantize="pq")
    q = (
        _emb(spark, SF_DIR)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("v", lambda x: x / F.col("norm")).alias("qvn"),
        )
    )
    served = {
        (r.query_id, r.rank): (r.neighbor_id, r.cell, r.cosine)
        for r in ann_ivfadc_query(spark, idx, q).collect()
    }
    inline = {
        (r.query_id, r.rank): (r.neighbor_id, r.cell, r.cosine)
        for r in ann_ivfadc_topk(spark, SF_DIR).collect()
    }
    assert served == inline

    def tree_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    # 8 small ints vs 64 doubles: the codes tree must be far below the
    # float cells tree (parquet overhead keeps it from the raw 16x)
    assert tree_bytes(idx + "/cells_pq") < 0.25 * tree_bytes(idx + "/cells")


def test_semdedup_prune_engine_parity(spark):
    """The arrow (blocked Gram matmul per cell) and catalyst (equi-join +
    per-pair HOF dot) prune engines must emit the same loser and kept
    sets — on the real corpus fit and on a synthetic frame with a
    threshold-straddling pair and a sub-split-sized cell."""
    from pyspark.sql import functions as F

    from artan_spark.plans import simsearch as S

    _e, n, _c, member = S._fitted_cells(spark, "/root/testdata/sf0.001")
    m = member.select("vec_id", "vn", "cid")
    for rl in (True, False):
        a = {r.vec_id for r in S._semdedup_prune(m, n, S.SEMDEDUP_THRESHOLD, 16384, return_losers=rl, engine="arrow").collect()}
        c = {r.vec_id for r in S._semdedup_prune(m, n, S.SEMDEDUP_THRESHOLD, 16384, return_losers=rl, engine="catalyst").collect()}
        assert a == c

    # synthetic: ids 0/1 near-identical (loser=1), 2 orthogonal; one cell
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.9999, 0.0141], 7),  # cos ~0.99995 > threshold
        (2, [0.0, 1.0], 7),
    ]
    sm = spark.createDataFrame(rows, "vec_id long, vn array<double>, cid int")
    la = {r.vec_id for r in S._semdedup_prune(sm, 3, 0.99, 10, return_losers=True, engine="arrow").collect()}
    lc = {r.vec_id for r in S._semdedup_prune(sm, 3, 0.99, 10, return_losers=True, engine="catalyst").collect()}
    assert la == lc == {1}
    # sub-split guard path (n > max_cell_size) keeps parity too
    la2 = {r.vec_id for r in S._semdedup_prune(sm, 3, 0.99, 2, return_losers=True, engine="arrow").collect()}
    lc2 = {r.vec_id for r in S._semdedup_prune(sm, 3, 0.99, 2, return_losers=True, engine="catalyst").collect()}
    assert la2 == lc2


# -- incremental index append (round 9) --------------------------------------


def _queries_of(spark, sf_dir, n=None):
    from pyspark.sql import functions as F

    from artan_spark.plans.simsearch import N_QUERIES, _emb

    return (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < (n or N_QUERIES))
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("v", lambda x: x / F.col("norm")).alias("qvn"),
        )
    )


def _new_batch(spark, sf_dir, lo=0, hi=50):
    """Deterministic append batch: reversed copies of vectors [lo, hi)
    under fresh disjoint ids."""
    from pyspark.sql import functions as F

    from artan_spark.sources import read_table

    return (
        read_table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
        )
    )


def test_ivf_append_serve_matches_rebuilt_index(spark, tmp_path):
    """Exact-rescore contract: with every cell probed, an appended index
    serves the identical top-k as an index REBUILT from scratch over the
    union corpus (cell layouts differ — only (neighbor, cosine) must
    match), because assignment only routes candidates and the rescore is
    exact. Staleness bookkeeping: n grows by the batch, drift ratio is a
    positive scalar."""
    from artan_spark.plans.simsearch import (
        KM_K,
        ann_ivf_query,
        append_to_ivf_index,
        build_ivf_index,
        ivf_index_staleness,
    )

    idx = str(tmp_path / "ivf_app")
    build_ivf_index(spark, SF_DIR, idx)
    new = _new_batch(spark, SF_DIR)
    append_to_ivf_index(spark, idx, new)

    # rebuilt reference over the union corpus, materialized as a table dir
    from artan_spark.sources import read_table

    union_dir = str(tmp_path / "sf_union")
    read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").unionByName(
        new
    ).write.parquet(union_dir + "/embeddings.parquet")
    idx2 = str(tmp_path / "ivf_rebuilt")
    build_ivf_index(spark, union_dir, idx2)

    q = _queries_of(spark, SF_DIR)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = {
        key(r): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, idx, q, nprobe=KM_K).collect()
    }
    want = {
        key(r): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, idx2, q, nprobe=KM_K).collect()
    }
    assert got == want and len(got) > 0

    st = ivf_index_staleness(spark, idx)
    assert st["n_now"] == st["n_build"] + 50
    assert st["drift_ratio"] > 0
    # the rebuilt index is its own anchor: drift ~1 by construction
    st2 = ivf_index_staleness(spark, idx2)
    assert abs(st2["drift_ratio"] - 1.0) < 1e-9


def test_ivf_append_is_chunk_invariant(spark, tmp_path):
    """Appending one batch in a single call or split across two calls
    yields identical cell contents for BOTH maintained layouts (cells +
    int8 cells_q): assignment and quantization are stateless per row
    against the frozen centroid table."""
    from artan_spark.plans.simsearch import append_to_ivf_index, build_ivf_index

    ia, ib = str(tmp_path / "a"), str(tmp_path / "b")
    build_ivf_index(spark, SF_DIR, ia, quantize=True)
    build_ivf_index(spark, SF_DIR, ib, quantize=True)
    append_to_ivf_index(spark, ia, _new_batch(spark, SF_DIR, 0, 50))
    append_to_ivf_index(spark, ib, _new_batch(spark, SF_DIR, 0, 25))
    append_to_ivf_index(spark, ib, _new_batch(spark, SF_DIR, 25, 50))

    def rows(d, sub):
        out = [tuple(r) for r in spark.read.parquet(d + sub).collect()]
        return sorted((r[0], tuple(r[1]) if isinstance(r[1], list) else r[1], *r[2:]) for r in out)

    assert rows(ia, "/cells") == rows(ib, "/cells")
    assert rows(ia, "/cells_q") == rows(ib, "/cells_q")

    # the appended int8 layout also SERVES: candidate generation from
    # cells_q with a covering rerank equals the full-precision serve
    from artan_spark.plans.simsearch import KM_K, ann_ivf_query

    q = _queries_of(spark, SF_DIR)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    quant = {
        key(r): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, ia, q, nprobe=KM_K, rerank=10000).collect()
    }
    full = {
        key(r): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, ia, q, nprobe=KM_K).collect()
    }
    assert quant == full and len(quant) > 0


def test_ivfadc_append_exact_rescore_matches_full_precision(spark, tmp_path):
    """After an append, the IVFADC layout (codes quantized against FROZEN
    codebooks — documented drift) still serves exactly when the rerank
    horizon covers the probed candidates: ADC only orders candidates, the
    final rescore reads full-precision cells. Serve must equal the
    full-precision serve of the SAME appended index."""
    from artan_spark.plans.simsearch import (
        KM_K,
        ann_ivf_query,
        ann_ivfadc_query,
        append_to_ivf_index,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivfadc_app")
    build_ivf_index(spark, SF_DIR, idx, quantize="pq")
    append_to_ivf_index(spark, idx, _new_batch(spark, SF_DIR))

    q = _queries_of(spark, SF_DIR)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    adc = {
        key(r): (r.neighbor_id, r.cosine)
        for r in ann_ivfadc_query(spark, idx, q, nprobe=KM_K, rerank=10000).collect()
    }
    full = {
        key(r): (r.neighbor_id, r.cosine)
        for r in ann_ivf_query(spark, idx, q, nprobe=KM_K).collect()
    }
    assert adc == full and len(adc) > 0
