"""Similarity search over the embedding column: brute-force cosine top-k
(correctness baseline) and a random-hyperplane-LSH bucketed variant (the
100 TB scale path — candidate generation drops from O(N*Q) to bucket-local).

Both engines share the hyperplanes (seeded numpy literals inlined into the
SQL), so results match exactly.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from artan_spark.sources import read_table

TOP_K = 5
N_QUERIES = 10  # queries = vec_id < N_QUERIES
DIM = 64

# OR-amplified multi-table LSH: L tables of K planes each. A single table of
# many planes has vanishing recall on weakly-similar corpora (p_plane^K —
# measured 6% here with one 6-plane table); candidates from ANY matching
# table give 1-(1-p^K)^L ≈ 0.85+ recall at cosine ~0.45 while still pruning
# the pair space per table.
N_TABLES = 6
PLANES_PER_TABLE = 3

_rng = np.random.RandomState(7)
HYPERPLANES = _rng.normal(0.0, 1.0, (N_TABLES, PLANES_PER_TABLE, DIM)).round(6)


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def _lit_array(vals) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _emb(spark, sf_dir, widen: bool = False):
    """``widen=True`` repartitions the scan up to core count BEFORE the
    per-element HOF work (cast/dot/normalize are interpreted, not codegen)
    — see _widen below. Opt-in: it pays for the HOF-HEAVY consumers
    (k-means fit = normalize + 16-dot argmax x 3 passes; round-7 A/B:
    sf1.0 kmeans 37.9 -> ~5s) but the extra shuffle LOSES ~0.3-0.6s on the
    lightweight single-pass ANN queries at bench scale, so those keep the
    raw scan."""
    e = read_table(spark, sf_dir, "embeddings")
    if widen:
        e = _widen(spark, e, cache_key=os.path.join(sf_dir, "embeddings.parquet"))
    e = e.select("vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("v"))
    return e.withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))


_EMB_SQL = """
SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
"""


def _widen(spark: SparkSession, df: DataFrame, cache_key: str | None = None) -> DataFrame:
    """Round-robin repartition a SCAN-NARROW input up to the session's core
    count when the source parquet has fewer splits than cores (the shared
    ``sources.widen_scan`` guard, no pushdown barrier — the HOF-heavy
    consumers here are aggregates, not pushable filters). The embeddings
    table is small on disk (a couple of row groups), so every downstream
    higher-order-function pass — interpreted per element, not codegen —
    would otherwise run on 2-3 tasks while the rest of the cluster idles;
    round-7 profiling measured the sf1.0 k-means normalize alone at 11.9s
    on 2 partitions vs ~1s widened. On a real 100-TB lake the scan already
    yields >= cores splits and this is a no-op."""
    from artan_spark.sources import widen_scan

    return widen_scan(spark, df, cache_key=cache_key, barrier=False)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k per query vector; queries broadcast, rank by
    full-precision cosine with vec_id tie-break. At scale the corpus side
    stays partitioned and only the tiny query set is broadcast."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", F.round("cosine", 6).alias("cosine"))
    )


ANN_FILTER_LANG = "en"


def ann_filtered_topk(
    spark: SparkSession, sf_dir: str, lang: str = ANN_FILTER_LANG
) -> DataFrame:
    """FILTERED vector search — top-k cosine neighbors restricted to
    vectors whose DOCUMENT satisfies an attribute predicate (here
    ``documents.lang``): the modern serving shape where metadata filters
    compose with similarity (every production vector store exposes it).

    Shape: the predicate pushes into the documents scan (a doc_id
    semi-join onto the embeddings side — at scale this is the
    pre-filtering strategy, correct at any selectivity; the IVF
    composition post-filters probed cells and must over-fetch, so the
    exact pre-filter is the oracle-able baseline); queries broadcast;
    same top-k/rounding/tie-break contract as ``ann_cosine_topk``.
    Queries themselves are NOT required to pass the filter — you search
    the English corpus from any query vector."""
    e = _emb(spark, sf_dir)
    allowed = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("lang") == lang)
        .select(F.col("doc_id").alias("vec_id"))
    )
    cand = e.join(allowed, "vec_id", "left_semi")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        cand.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


_ANN_FILTERED_SQL = f"""
WITH n AS ({_EMB_SQL}),
allowed AS (SELECT doc_id AS vec_id FROM documents WHERE lang = '{ANN_FILTER_LANG}'),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM n WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(e.v, q.qv) / (e.norm * q.qn) AS cosine
  FROM n e
  JOIN allowed a ON a.vec_id = e.vec_id
  CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


_ANN_TOPK_SQL = f"""
WITH n AS ({_EMB_SQL})
SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.v) / (e.norm * q.norm) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY list_dot_product(e.v, q.v) / (e.norm * q.norm) DESC,
                                     e.vec_id ASC) AS rank
  FROM n e JOIN n q ON q.vec_id < {N_QUERIES} AND e.vec_id != q.vec_id
)
WHERE rank <= {TOP_K}
"""


def _bucket_expr_spark(vcol, table: int):
    b = F.lit(0).cast("long")
    for j in range(PLANES_PER_TABLE):
        plane = _lit_array(HYPERPLANES[table][j])
        b = b + F.when(_dot(vcol, plane) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return b


def _bucket_expr_sql(v: str, table: int) -> str:
    parts = []
    for j in range(PLANES_PER_TABLE):
        lit = "[" + ", ".join(str(x) for x in HYPERPLANES[table][j]) + "]"
        parts.append(f"(CASE WHEN list_dot_product({v}, {lit}) > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(parts)


def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-random-projection LSH: candidate pairs share a
    bucket in ANY of the L tables (OR-amplification), then exact cosine
    rank over the candidate union. Map-side bucket ids, bucket-co-partitioned
    joins per table — the pair space shrinks per table while recall is
    amplified across tables."""
    e = _emb(spark, sf_dir)
    for t in range(N_TABLES):
        e = e.withColumn(f"b{t}", _bucket_expr_spark(F.col("v"), t))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(N_TABLES)],
    )
    any_table = None
    for t in range(N_TABLES):
        cond = F.col(f"b{t}") == F.col(f"qb{t}")
        any_table = cond if any_table is None else (any_table | cond)
    scored = (
        e.join(F.broadcast(q), any_table & (F.col("vec_id") != F.col("query_id")))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", F.round("cosine", 6).alias("cosine"))
    )


def _ann_lsh_sql() -> str:
    bucket_cols = ", ".join(f"{_bucket_expr_sql('v', t)} AS b{t}" for t in range(N_TABLES))
    any_cond = " OR ".join(f"e.b{t} = q.b{t}" for t in range(N_TABLES))
    return f"""
WITH n AS ({_EMB_SQL}),
b AS (SELECT vec_id, v, norm, {bucket_cols} FROM n)
SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.v) / (e.norm * q.norm) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY list_dot_product(e.v, q.v) / (e.norm * q.norm) DESC,
                                     e.vec_id ASC) AS rank
  FROM b e JOIN b q ON q.vec_id < {N_QUERIES} AND ({any_cond}) AND e.vec_id != q.vec_id
)
WHERE rank <= {TOP_K}
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + dispersion: array aggregation via posexplode
    (JVM-native columnar path; at scale this is the classic narrow
    explode -> (label, pos) hash agg with map-side combine)."""
    e = read_table(spark, sf_dir, "embeddings")
    pos = e.select("label", F.posexplode(F.transform("embedding", lambda v: v.cast("double"))))
    return (
        pos.groupBy("label", "pos")
        .agg(F.avg("col").alias("dim_mean"))
        .groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("dim_mean") * F.col("dim_mean"))), 6).alias("centroid_norm"),
            F.count(F.lit(1)).alias("n_dims"),
        )
    )


_CENTROID_SQL = """
SELECT label,
       ROUND(sqrt(SUM(dim_mean * dim_mean)), 6) AS centroid_norm,
       COUNT(*) AS n_dims
FROM (
  SELECT label, pos, AVG(x) AS dim_mean
  FROM (SELECT label, unnest(list_transform(embedding, y -> CAST(y AS DOUBLE))) AS x,
               generate_subscripts(embedding, 1) - 1 AS pos
        FROM embeddings)
  GROUP BY 1, 2
)
GROUP BY label
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int = 1) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-label centroids (the inverted
    lists); each query probes its ``nprobe`` nearest centroids' lists, then
    exact cosine top-k over the probed candidates.

    At 100 TB: centroids are a broadcast table, list membership is a
    partition key, so each query touches ``nprobe`` partitions' worth of
    vectors — the classic IVF recall/candidate-count dial (recall test:
    tests/test_simsearch_quality.py).
    """
    # label lives in the same parquet row as the embedding — project it in
    # the base scan instead of re-joining the table to itself (the join was
    # a full-corpus shuffle at scale for a column the scan already has)
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("v")
    )
    e = e.withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))

    pos = e.select("label", F.posexplode(F.col("v")).alias("pos", "x"))
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]).alias("cv")
        )
        .withColumn("cnorm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    )

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    qc = q.join(F.broadcast(cent), F.lit(True)).withColumn(
        "ccos", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cnorm"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    probe = (
        qc.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qv", "qn", F.col("label").alias("cell"))
    )

    scored = (
        e.join(F.broadcast(probe), (F.col("label") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cell", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _ann_ivf_sql(nprobe: int = 1) -> str:
    return f"""
WITH n AS ({_EMB_SQL}),
e AS (SELECT n.vec_id, n.v, n.norm, emb.label
      FROM n JOIN embeddings emb ON n.vec_id = emb.vec_id),
pos AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) - 1 AS p FROM e),
dim AS (SELECT label, p, AVG(x) AS m FROM pos GROUP BY 1, 2),
cent AS (SELECT label, list(m ORDER BY p) AS cv FROM dim GROUP BY label),
centn AS (SELECT label, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cnorm FROM cent),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM e WHERE vec_id < {N_QUERIES}),
probe AS (
  SELECT query_id, qv, qn, label AS cell FROM (
    SELECT q.query_id, q.qv, q.qn, c.label,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qv, c.cv) / (q.qn * c.cnorm) DESC,
                                       c.label ASC) AS crank
    FROM q CROSS JOIN centn c
  ) WHERE crank <= {nprobe}
)
SELECT query_id, neighbor_id, cell, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT p.query_id, e.vec_id AS neighbor_id, p.cell,
         list_dot_product(e.v, p.qv) / (e.norm * p.qn) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY list_dot_product(e.v, p.qv) / (e.norm * p.qn) DESC,
                                     e.vec_id ASC) AS rank
  FROM e JOIN probe p ON e.label = p.cell AND e.vec_id != p.query_id
)
WHERE rank <= {TOP_K}
"""


# -- k-means IVF ------------------------------------------------------------

KM_K = 16  # coarse-quantizer cell FLOOR (oracle-determinism scale); see km_k_for
KM_ITERS = 2  # unrolled Lloyd iterations (also unrolled in the SQL oracle)
KM_NPROBE = 2

# SemDeDup's design point is cluster count PROPORTIONAL to corpus size
# (Abbas et al. 2023 use ~50k clusters on LAION-440M ≈ 9k vectors/cell);
# with K fixed, cells grow O(N/K) and every within-cell self-join is
# quadratic in N. Derive K ≈ N / TARGET_CELL_SIZE instead — at the driver
# test scales (N <= 20k) this floors at KM_K = 16 so every oracle stays
# bit-identical, while a 100-TB corpus gets ~N/4096 cells.
TARGET_CELL_SIZE = 4096
# k-means balances nothing: a skewed corpus can still pour most vectors
# into one cell. Cells above MAX_CELL_FACTOR x target are hash-sub-split
# to bound pair work (see dedup_semantic_vectors).
MAX_CELL_FACTOR = 4

PQ_M = 8  # subspaces (dim 64 -> 8 dims each on the driver embeddings)
PQ_K = 16  # codewords per subspace (4-bit codes)
PQ_ITERS = 2  # unrolled Lloyd iterations, same determinism contract as IVF
PQ_RERANK = 4 * TOP_K


def km_k_for(n_vectors: int, target_cell_size: int = TARGET_CELL_SIZE) -> int:
    """Corpus-derived cluster count: ``max(KM_K, ceil(N / target))`` —
    the paper's N-proportional scaling with the small-N floor that keeps
    driver-scale oracles deterministic (N <= KM_K * target ⇒ K == KM_K)."""
    import math

    return max(KM_K, math.ceil(n_vectors / max(1, target_cell_size)))


def _oracle_scale_check(n: int) -> None:
    """The registered DuckDB oracles (`_kmeans_cells_cte`) textually unroll
    exactly ``KM_K`` unsplit cells — they cannot follow the corpus-derived
    K or the hash-sub-split guard. The driver-table wrappers whose results
    are compared against those oracles call this so growing the testdata
    past the contract fails LOUDLY here instead of as an opaque value-hash
    diff in the parity gate. Scale users call the `*_vectors` /
    `_fit_kmeans_cells` cores directly, which have no such bound."""
    if km_k_for(n) != KM_K:
        raise RuntimeError(
            f"oracle scale contract exceeded: N={n} vectors derives "
            f"k={km_k_for(n)} != KM_K={KM_K}, but the registered DuckDB "
            f"oracle unrolls exactly {KM_K} cells (valid only for "
            f"N <= {KM_K * TARGET_CELL_SIZE}). Use dedup_semantic_vectors/"
            f"_fit_kmeans_cells directly at scale, or regenerate the oracle."
        )


def _assign_cells(vecs: DataFrame, cent_df: DataFrame) -> DataFrame:
    """Attach each vector's nearest-centroid id MAP-SIDE: the KM_K
    centroids collapse to one broadcast row of array<struct<cid,cv>>
    and the argmax is a higher-order-function reduce per row — no
    Exchange on the embeddings side (the old formulation was a
    crossJoin + row_number window, i.e. a full-corpus hash shuffle
    per assignment pass). First occurrence of the max dot wins, and
    the array is cid-sorted, so ties break to the smallest cid —
    identical to the window's (dot DESC, cid ASC) and the oracle.
    Shared by the Lloyd fit and the incremental index append so the
    tie-break contract has exactly one home."""
    carr = cent_df.agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    # one dot per centroid, computed once: argmax = array_max over
    # struct(dot, -cid) (struct compare is lexicographic, so ties on
    # dot resolve to the SMALLEST cid)
    best = F.array_max(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(_dot(F.col("vn"), c["cv"]).alias("dot"), (-c["cid"]).alias("ncid")),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(carr))
        .withColumn("cid", -best["ncid"])
        .drop("cents")
    )


def _fit_kmeans_cells(e: DataFrame, init: DataFrame | None = None, k: int = KM_K):
    """Deterministic spherical k-means fit over normalized vectors ``e``
    (vec_id, vn): init = first ``k`` vectors (or a caller-supplied
    (cid, cv) frame — dedup_semantic_vectors passes the k smallest ids
    so arbitrary id sets stay deterministic), KM_ITERS Lloyd iterations,
    centroids rounded to 6 decimals after every update (the cross-engine
    determinism contract). Returns (centroids(cid, cv), members = e + cid).
    """
    cent = init if init is not None else e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("vn").alias("cv")
    )

    def with_cell(cent_df):
        return _assign_cells(e, cent_df)

    for _ in range(KM_ITERS):
        pos = with_cell(cent).select("cid", F.posexplode(F.col("vn")).alias("pos", "x"))
        cent = (
            pos.groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.transform(F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]).alias("cm"))
            .withColumn("cn", F.sqrt(_dot(F.col("cm"), F.col("cm"))))
            .select("cid", F.transform("cm", lambda x: F.round(x / F.col("cn"), 6)).alias("cv"))
            # KM_K rows; truncate lineage so each Lloyd pass (and the final
            # assignment) scans the corpus once instead of replaying every
            # earlier pass — the same driver-loop materialization pattern as
            # the batch-EM reference loop (MixtureBase.scala:257-316)
            .localCheckpoint()
        )

    return cent, with_cell(cent)


# session memos per (applicationId, embeddings path, freshness token) —
# both are PURE functions of the immutable parquet (deterministic init,
# rounded centroids), so every consumer in a session shares them instead
# of re-running the work per call. This is the contract the SemDeDup
# docstring states ("a corpus pipeline fits once and both serves ANN and
# semantically dedups from the same cells") made real. Values hold
# localCheckpoint'd frames: one normalized-embeddings copy per path stays
# pinned for the session; stale-token entries are evicted.
_NORM_CACHE: dict[tuple, tuple] = {}  # -> (normalized_ckpt, n)
_KMEANS_CACHE: dict[tuple, tuple] = {}  # -> (centroids, members)
_PQ_CACHE: dict[tuple, tuple] = {}  # -> (codebooks, codes_ckpt) on raw vectors
_IVFADC_CACHE: dict[tuple, tuple] = {}  # -> (cell means, codebooks, codes_ckpt)


def _memo_key(spark: SparkSession, sf_dir: str) -> tuple:
    from artan_spark.sources import _path_token

    path = os.path.join(sf_dir, "embeddings.parquet")
    return (spark.sparkContext.applicationId, path, _path_token(path))


def _evict_stale(cache: dict, key: tuple) -> None:
    for stale in [kk for kk in cache if kk[:2] == key[:2] and kk != key]:
        del cache[stale]


def _norm_ckpt(spark: SparkSession, sf_dir: str):
    """Memoized (normalized_checkpoint, n) for the embeddings table:
    widen + cast + normalize + localCheckpoint once per session — the
    input every multi-pass consumer (k-means, PQ, IVFADC) re-reads."""
    key = _memo_key(spark, sf_dir)
    hit = _NORM_CACHE.get(key)
    if hit is not None:
        return hit
    e = (
        _emb(spark, sf_dir, widen=True)
        .select("vec_id", F.transform("v", lambda x: x / F.col("norm")).alias("vn"))
        .localCheckpoint()
    )
    n = e.count()  # cheap: e is checkpointed above
    _evict_stale(_NORM_CACHE, key)
    _NORM_CACHE[key] = (e, n)
    return e, n


def _fitted_cells(spark: SparkSession, sf_dir: str):
    """Memoized (normalized_ckpt, n, centroids, members): the
    corpus-derived-K spherical k-means fit (`km_k_for`) over `_norm_ckpt`,
    shared by ann_ivf_kmeans / dedup_semantic / IVFADC / the curation
    pipeline for the rest of the session (same freshness-token
    invalidation as ``sources.widen_scan``)."""
    e, n = _norm_ckpt(spark, sf_dir)
    key = _memo_key(spark, sf_dir)
    hit = _KMEANS_CACHE.get(key)
    if hit is None:
        hit = _fit_kmeans_cells(e, k=km_k_for(n))
        _evict_stale(_KMEANS_CACHE, key)
        _KMEANS_CACHE[key] = hit
    cent, member = hit
    return e, n, cent, member


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str, nprobe: int = KM_NPROBE) -> DataFrame:
    """IVF with a REAL coarse quantizer: spherical k-means over the
    normalized embeddings (deterministic init = first KM_K vectors, KM_ITERS
    Lloyd iterations), probe the ``nprobe`` nearest cells, exact cosine
    re-rank inside them.

    The label-cell variant above is oracle-simple but labels are
    uncorrelated with cosine geometry on this corpus (recall 0.12 at
    nprobe=1); k-means cells lift candidate recall to ~0.8+ at nprobe=2
    (tests/test_simsearch_quality.py). Determinism contract with the DuckDB
    oracle: centroids are ROUNDED to 6 decimals after every update, so both
    engines assign cells from bit-identical inputs; dot products are
    left-to-right in both engines (same contract the other ANN oracles rely
    on). At 100 TB: centroids stay a broadcast table, assignment is a
    map-side argmax, each Lloyd iteration is one narrow (cell, pos) agg.
    """
    # normalized vectors are read by every Lloyd pass + the final assignment
    # + scoring: `_fitted_cells` materializes the narrow (vec_id, vn)
    # projection and the corpus-derived-K fit ONCE PER SESSION (cells stay
    # ~TARGET_CELL_SIZE as N grows, bounding per-query rerank at
    # nprobe x cell instead of nprobe x N/16) and shares both with
    # dedup_semantic / the curation pipeline.
    e, n, cent, member = _fitted_cells(spark, sf_dir)
    _oracle_scale_check(n)  # this wrapper is bound to the unrolled-K oracle

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vn").alias("qvn")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cid"))
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("qdot", _dot(F.col("qvn"), F.col("cv")))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qvn", F.col("cid").alias("cell"))
    )

    scored = member.join(
        F.broadcast(probe),
        (F.col("cid") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("cosine", _dot(F.col("vn"), F.col("qvn")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def build_ivf_index(
    spark: SparkSession, sf_dir: str, out_dir: str, quantize: bool | str = False
) -> None:
    """Materialize the spherical-k-means IVF index for build-once /
    query-many serving: the same fit as ``ann_ivf_kmeans`` (identical
    determinism contract), with centroids as one small parquet and the
    cell members PARTITIONED BY cell id — a probe then reads only its
    ``nprobe`` cells via partition pruning instead of re-fitting and
    re-scanning the corpus per query batch. This is the production shape
    at 100 TB: fit once on a sample/full pass, serve many query batches
    against the pruned layout.

    ``quantize=True`` additionally writes ``cells_q`` — the int8 projection
    of the same members (``quantize_embeddings``), also cell-partitioned.
    Serving can then generate candidates from the ~4×-smaller quantized
    layout and touch the full-precision cells only for the rerank rows
    (both scans partition-pruned) — composing the two scale levers.

    ``quantize="pq"`` writes the IVFADC layout instead (the FAISS
    ``IVFx,PQy`` on-disk shape): ``means`` (the unnormalized cell means
    residuals anchor on), ``pq_codebooks`` (PQ_M x PQ_K rows), and
    ``cells_pq`` — PQ codes of the cell-mean residuals, cell-partitioned
    (~PQ_M small ints/vector, ~16x narrower than the float64 cells).
    Serve with ``ann_ivfadc_query``; same fits and determinism contract
    as ``ann_ivfadc_topk``, so serving matches the inline path
    row-for-row (tested).
    """
    # session-shared fit: building an index after serving/dedup in the
    # same session reuses the identical centroids (and vice versa)
    e, _n, cent, member = _fitted_cells(spark, sf_dir)
    cent.write.mode("overwrite").parquet(out_dir + "/centroids")
    member.select("vec_id", "vn", "cid").write.mode("overwrite").partitionBy("cid").parquet(
        out_dir + "/cells"
    )
    # build-time fit quality, the anchor ivf_index_staleness compares
    # against after appends: mean spherical distance (1 - cosine) of every
    # member to its assigned centroid
    member.join(F.broadcast(cent), "cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.lit(1.0) - _dot(F.col("vn"), F.col("cv"))).alias("mean_dist"),
    ).write.mode("overwrite").parquet(out_dir + "/stats")
    if quantize == "pq":
        means = (
            member.select("cid", F.posexplode("vn").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: F.round(s["m"], 6),
                ).alias("cm")
            )
            .localCheckpoint()
        )
        resid = (
            member.join(F.broadcast(means), "cid")
            .select(
                "cid", "vec_id", F.zip_with("vn", "cm", lambda a, b: a - b).alias("vn")
            )
            .localCheckpoint()
        )
        dim = len(e.select("vn").first()["vn"])
        cb = _fit_pq_codebooks(resid.select("vec_id", "vn"), dim)
        means.write.mode("overwrite").parquet(out_dir + "/means")
        cb.write.mode("overwrite").parquet(out_dir + "/pq_codebooks")
        pq_encode(resid, cb, dim).write.mode("overwrite").partitionBy("cid").parquet(
            out_dir + "/cells_pq"
        )
    elif quantize:
        # vn is unit-norm already, so norms need not be stored; same
        # symmetric int8 scheme as quantize_embeddings
        scale = F.array_max(F.transform("vn", F.abs)) / F.lit(127.0)
        scale = F.when(scale > 0, scale).otherwise(F.lit(1.0))
        member.select(
            "vec_id",
            "cid",
            scale.alias("scale"),
            F.transform("vn", lambda x: F.round(x / scale).cast("int")).alias("q"),
        ).write.mode("overwrite").partitionBy("cid").parquet(out_dir + "/cells_q")


def ann_ivf_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int = KM_NPROBE,
    top_k: int = TOP_K,
    rerank: int | None = None,
) -> DataFrame:
    """Serve ANN queries against a materialized ``build_ivf_index`` layout.

    ``queries``: (query_id, qvn) with qvn already L2-normalized. Probe =
    broadcast-centroid argtop-nprobe per query; candidates come from a join
    against the cell-partitioned parquet on the PARTITION column, so
    Spark's dynamic partition pruning restricts the scan to the probed
    cells; exact cosine re-rank inside them (same rounding contract as
    ``ann_ivf_kmeans``).

    With ``rerank`` set (index built with ``quantize=True``), candidate
    scoring reads the int8 ``cells_q`` layout instead — ~4× less scan I/O —
    keeps the top ``rerank`` per query by approximate score, and touches
    the full-precision cells only for those rows (joined on the partition
    column + vec_id, so that scan is pruned too). Emitted cosines are
    exact either way; with ``rerank`` comfortably above ``top_k`` the
    results match the full-precision serve row-for-row (tested).
    """
    cent = spark.read.parquet(index_dir + "/centroids")
    member = spark.read.parquet(index_dir + "/cells")

    wq = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cid"))
    probe = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("qdot", _dot(F.col("qvn"), F.col("cv")))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "qvn", F.col("cid").alias("cell"))
    )
    if rerank is not None:
        memq = spark.read.parquet(index_dir + "/cells_q")
        approx = memq.join(
            F.broadcast(probe),
            (F.col("cid") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
        ).withColumn(
            "acos",
            F.col("scale") * _dot(F.transform("q", lambda x: x.cast("double")), F.col("qvn")),
        )
        wa = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
        cand = (
            approx.withColumn("arank", F.row_number().over(wa))
            .filter(F.col("arank") <= rerank)
            .select("query_id", "qvn", "vec_id", "cell")
        )
        scored = member.join(
            F.broadcast(cand),
            (F.col("cid") == F.col("cell")) & (member["vec_id"] == cand["vec_id"]),
        ).select(
            "query_id", "qvn", member["vec_id"].alias("vec_id"), "cell", "vn"
        ).withColumn("cosine", _dot(F.col("vn"), F.col("qvn")))
    else:
        scored = member.join(
            F.broadcast(probe),
            (F.col("cid") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
        ).withColumn("cosine", _dot(F.col("vn"), F.col("qvn")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ann_ivfadc_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int = KM_NPROBE,
    top_k: int = TOP_K,
    rerank: int = PQ_RERANK,
) -> DataFrame:
    """Serve ANN queries against a ``build_ivf_index(..., quantize="pq")``
    layout — the IVFADC serving path: probe ``nprobe`` cells by broadcast
    spherical centroids, ADC-score the probed cells' PQ codes (the scan
    reads ONLY ``cells_pq``, partition-pruned to the probed cells and
    ~16x narrower than the float cells), then exact-rescore the top
    ``rerank`` rows against the full-precision cells (that scan pruned on
    cell + vec_id). ``queries``: (query_id, qvn), qvn L2-normalized.
    Same contract as ``ann_ivfadc_topk``: emitted cosines exact, results
    row-for-row equal to the inline path for the same corpus (tested)."""
    cent = spark.read.parquet(index_dir + "/centroids")
    means = spark.read.parquet(index_dir + "/means")
    cb = spark.read.parquet(index_dir + "/pq_codebooks")
    codes = spark.read.parquet(index_dir + "/cells_pq")
    member = spark.read.parquet(index_dir + "/cells")

    wq = Window.partitionBy("query_id").orderBy(F.desc("rdot"), F.asc("cid"))
    probe = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("rdot", _dot(F.col("qvn"), F.col("cv")))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .join(F.broadcast(means), "cid")
        .withColumn("qdot", _dot(F.col("qvn"), F.col("cm")))
        .select("query_id", F.col("cid").alias("cell"), "qdot")
    )
    dim = len(queries.select("qvn").first()["qvn"])
    ds = dim // PQ_M
    carr = cb.agg(F.array_sort(F.collect_list(F.struct("sub", "code", "cv"))).alias("cbs"))
    qmaps = (
        queries.crossJoin(F.broadcast(carr))
        .select("query_id", _adc_table(ds).alias("qmap"))
    )
    pr = probe.join(qmaps, "query_id")

    approx = codes.join(
        F.broadcast(pr),
        (F.col("cid") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("acos", F.col("qdot") + _adc_score())
    wa = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    cand = (
        approx.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "vec_id", "cell")
    )
    scored = (
        member.join(
            F.broadcast(cand),
            (F.col("cid") == F.col("cell")) & (member["vec_id"] == cand["vec_id"]),
        )
        .select("query_id", member["vec_id"].alias("vec_id"), "cell", "vn")
        .join(F.broadcast(queries), "query_id")
        .withColumn("cosine", _dot(F.col("vn"), F.col("qvn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def append_to_ivf_index(
    spark: SparkSession, index_dir: str, new_vectors: DataFrame
) -> None:
    """Incremental index maintenance: assign ``new_vectors`` (vec_id,
    embedding — the embeddings-table shape; vec_ids must be disjoint from
    the indexed set) to the EXISTING centroids and append cell-partitioned
    files. No refit, no rewrite of existing cells — the daily-append path
    for a lake that can't afford a full rebuild per batch.

    Centroids, cell means, and PQ codebooks stay FROZEN: appended vectors
    are quantized against codebooks fitted before they existed (codebook
    drift). Drift is measurable — ``ivf_index_staleness`` compares the
    current mean distance-to-assigned-centroid against the build-time
    anchor (``/stats``); rebuild when the ratio crosses the caller's
    tolerance (FAISS practice: ~1.1-1.5x).

    Layouts present in the index are maintained automatically: ``cells``
    always; ``cells_q`` (int8) and ``cells_pq`` + residual encoding when
    the build wrote them. Append is chunk-invariant: appending a batch in
    one call or split across calls yields the same cell contents (assign
    and encode are stateless per row given the frozen tables).

    100-TB shape: assignment/quantization are map-side against broadcast
    centroid/codebook tables (no shuffle on the new batch); writes go
    only to the partitions the batch's cells touch."""
    cent = spark.read.parquet(index_dir + "/centroids")
    v = new_vectors.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    vn = v.select("vec_id", F.transform("v", lambda x: x / F.col("norm")).alias("vn"))
    # reused by up to three layout writes below; batch-sized, not corpus-sized
    member = _assign_cells(vn, cent).localCheckpoint()
    if member.isEmpty():
        # early-return BEFORE any layout write: an empty batch used to
        # crash reading dim from first() AFTER partially appending /cells
        # and /cells_q — a non-atomic no-op-gone-wrong (r9 ADVICE)
        return
    member.select("vec_id", "vn", "cid").write.mode("append").partitionBy("cid").parquet(
        index_dir + "/cells"
    )
    if os.path.isdir(index_dir + "/cells_q"):
        scale = F.array_max(F.transform("vn", F.abs)) / F.lit(127.0)
        scale = F.when(scale > 0, scale).otherwise(F.lit(1.0))
        member.select(
            "vec_id",
            "cid",
            scale.alias("scale"),
            F.transform("vn", lambda x: F.round(x / scale).cast("int")).alias("q"),
        ).write.mode("append").partitionBy("cid").parquet(index_dir + "/cells_q")
    if os.path.isdir(index_dir + "/cells_pq"):
        means = spark.read.parquet(index_dir + "/means")
        cb = spark.read.parquet(index_dir + "/pq_codebooks")
        resid = member.join(F.broadcast(means), "cid").select(
            "cid", "vec_id", F.zip_with("vn", "cm", lambda a, b: a - b).alias("vn")
        )
        dim = len(member.select("vn").first()["vn"])  # checkpointed, non-empty
        pq_encode(resid, cb, dim).write.mode("append").partitionBy("cid").parquet(
            index_dir + "/cells_pq"
        )


def ivf_index_staleness(spark: SparkSession, index_dir: str) -> dict:
    """Drift metric for an appended index: current mean spherical distance
    (1 - cosine) of ALL members to their assigned centroid vs the
    build-time anchor written by ``build_ivf_index``. Returns metadata
    scalars (one corpus aggregate + one 1-row read):

    - ``n_build`` / ``mean_dist_build`` — the fit-time anchor,
    - ``n_now`` / ``mean_dist_now`` — the same aggregate today,
    - ``drift_ratio`` — mean_dist_now / mean_dist_build (1.0 = fresh;
      appends that land far from every frozen centroid push it up)."""
    build = spark.read.parquet(index_dir + "/stats").first()
    cent = spark.read.parquet(index_dir + "/centroids")
    now = (
        spark.read.parquet(index_dir + "/cells")
        .join(F.broadcast(cent), "cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(F.lit(1.0) - _dot(F.col("vn"), F.col("cv"))).alias("mean_dist"),
        )
        .first()
    )
    base = build["mean_dist"] if build["mean_dist"] else 1e-12
    return {
        "n_build": build["n"],
        "mean_dist_build": build["mean_dist"],
        "n_now": now["n"],
        "mean_dist_now": now["mean_dist"],
        "drift_ratio": now["mean_dist"] / base,
    }


def _kmeans_cells_cte() -> str:
    """Shared WITH-preamble: normalized vectors ``n``, the unrolled Lloyd
    iterations (a{i} assignment / c{i} update pairs, centroids rounded to
    6 decimals per the cross-engine determinism contract), and the final
    ``cells`` assignment — reused by the IVF-kmeans oracle and SemDeDup."""
    sql = f"""
WITH n0 AS ({_EMB_SQL}),
n AS (SELECT vec_id, list_transform(v, x -> x / norm) AS vn FROM n0),
c0 AS (SELECT vec_id AS cid, vn AS cv FROM n WHERE vec_id < {KM_K})"""
    prev = "c0"
    for i in range(1, KM_ITERS + 1):
        sql += f""",
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid ASC) AS arank
    FROM n CROSS JOIN {prev} c
  ) WHERE arank = 1
),
m{i} AS (
  SELECT a.cid, generate_subscripts(n.vn, 1) AS pos, unnest(n.vn) AS x
  FROM n JOIN a{i} a ON n.vec_id = a.vec_id
),
d{i} AS (SELECT cid, pos, AVG(x) AS m FROM m{i} GROUP BY 1, 2),
g{i} AS (SELECT cid, list(m ORDER BY pos) AS cm FROM d{i} GROUP BY cid),
c{i} AS (
  SELECT cid, list_transform(cm, x -> ROUND(x / sqrt(list_sum(list_transform(cm, y -> y * y))), 6)) AS cv
  FROM g{i}
)"""
        prev = f"c{i}"
    sql += f""",
cells AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                              ORDER BY list_dot_product(n.vn, c.cv) DESC, c.cid ASC) AS arank
    FROM n CROSS JOIN {prev} c
  ) WHERE arank = 1
)"""
    return sql


def _ann_ivf_kmeans_sql(nprobe: int = KM_NPROBE) -> str:
    prev = f"c{KM_ITERS}"
    sql = _kmeans_cells_cte()
    sql += f""",
q AS (SELECT vec_id AS query_id, vn AS qvn FROM n WHERE vec_id < {N_QUERIES}),
probe AS (
  SELECT query_id, qvn, cid AS cell FROM (
    SELECT q.query_id, q.qvn, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qvn, c.cv) DESC, c.cid ASC) AS crank
    FROM q CROSS JOIN {prev} c
  ) WHERE crank <= {nprobe}
)
SELECT query_id, neighbor_id, cell, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT p.query_id, n.vec_id AS neighbor_id, p.cell,
         list_dot_product(n.vn, p.qvn) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY list_dot_product(n.vn, p.qvn) DESC, n.vec_id ASC) AS rank
  FROM n JOIN cells ON n.vec_id = cells.vec_id
  JOIN probe p ON cells.cid = p.cell AND n.vec_id != p.query_id
)
WHERE rank <= {TOP_K}
"""
    return sql


def quantize_embeddings(e: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization, pure Catalyst.

    ``scale = max(|v_i|) / 127``, ``q_i = round(v_i / scale)`` ∈ [-127, 127].
    At 100 TB this is the stored projection that cuts embedding scan I/O 4×
    vs float32 (8× vs float64): the quantized table (q: array<int8-range>,
    one double scale, one double norm) is what the candidate-generation scan
    reads; full-precision vectors are touched only for the tiny rescoring
    join. Max per-component error is scale/2 by construction.
    """
    scale = F.array_max(F.transform("v", F.abs)) / F.lit(127.0)
    # all-zero vectors: keep scale NULL-safe (quantized components all 0)
    scale = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    return e.select(
        "vec_id",
        "norm",
        scale.alias("scale"),
        F.transform("v", lambda x: F.round(x / scale).cast("int")).alias("q"),
    )


def ann_quantized_topk(spark: SparkSession, sf_dir: str, rerank: int = 4 * TOP_K) -> DataFrame:
    """ANN over int8-quantized embeddings with exact rescoring.

    Stage 1 (the 4×-cheaper scan): approximate cosine from the quantized
    arrays — ``scale_a·scale_b·Σ qa_i·qb_i / (norm_a·norm_b)`` — and keep the
    top ``rerank`` candidates per query (a window, no driver state).
    Stage 2: join ONLY those Q×rerank candidate rows back to the
    full-precision vectors and rank by exact cosine. With rerank > k the
    quantization error (≤ scale/2 per component) is absorbed: candidate sets
    differ from exact brute force only past the rerank horizon, and the
    emitted scores are exact by construction (test asserts equality with
    ``ann_cosine_topk`` row-for-row).
    """
    e = _emb(spark, sf_dir)
    qt = quantize_embeddings(e)
    probe = qt.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("pq"),
        F.col("scale").alias("pscale"),
        F.col("norm").alias("pn"),
    )
    approx = (
        qt.join(F.broadcast(probe), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "acos",
            F.col("scale") * F.col("pscale") * _dot(F.col("q"), F.col("pq"))
            / (F.col("norm") * F.col("pn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    cand = (
        approx.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "vec_id")
    )
    # exact rescoring: only Q*rerank rows touch full-precision vectors
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("norm") * F.col("qn")))
    )
    wx = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wx))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


# -- product quantization (Jegou et al. 2011) -------------------------------

def _l2sq(x, c) -> F.Column:
    """Left-to-right squared L2 distance between two array columns."""
    return F.aggregate(
        F.zip_with(x, c, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda s, d: s + d
    )


def _fit_pq_codebooks(e_vn: DataFrame, dim: int, m: int = PQ_M, k: int = PQ_K) -> DataFrame:
    """Deterministic product-quantization codebooks ("Product Quantization
    for Nearest Neighbor Search", Jegou, Douze & Schmid, TPAMI 2011): the
    ``dim``-d vectors split into ``m`` contiguous subspaces and each
    subspace gets its own ``k``-codeword L2 k-means fit — all ``m`` fits
    run in the SAME Spark jobs (sub is just a grouping column).

    Determinism contract (mirrors ``_fit_kmeans_cells``): init = the
    subvectors of the ``k`` smallest vec_ids, PQ_ITERS Lloyd iterations,
    centroids rounded to 6 decimals after every update, distance ties to
    the smallest code. Codes that lose every member drop out (assignment
    only ever picks surviving codes). Returns (sub, code, cv) — m*k tiny
    rows. 100-TB shape: codebooks broadcast; each Lloyd pass is one
    map-side argmin + one narrow (sub, code, pos) agg over the corpus."""
    ds = dim // m
    if ds * m != dim:
        raise ValueError(f"PQ_M={m} must divide the embedding dim {dim}")
    subs = e_vn.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("vn", s * ds + 1, ds),
            )
        ).alias("sub", "sv"),
    )
    cb = subs.filter(F.col("vec_id") < k).select(
        "sub", F.col("vec_id").cast("int").alias("code"), F.col("sv").alias("cv")
    )

    def assign(cb_df):
        carr = cb_df.agg(F.array_sort(F.collect_list(F.struct("sub", "code", "cv"))).alias("cbs"))
        best = F.array_max(
            F.transform(
                F.filter(F.col("cbs"), lambda c: c["sub"] == F.col("sub")),
                lambda c: F.struct(
                    (-_l2sq(F.col("sv"), c["cv"])).alias("nd"), (-c["code"]).alias("nc")
                ),
            )
        )
        return subs.crossJoin(F.broadcast(carr)).withColumn("code", -best["nc"]).drop("cbs")

    for _ in range(PQ_ITERS):
        pos = assign(cb).select("sub", "code", F.posexplode("sv").alias("pos", "x"))
        cb = (
            pos.groupBy("sub", "code", "pos")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))), lambda s: s["mu"]
                ).alias("cm")
            )
            .select("sub", "code", F.transform("cm", lambda x: F.round(x, 6)).alias("cv"))
            .localCheckpoint()  # m*k rows; truncate lineage per Lloyd pass
        )
    return cb


def pq_encode(e_vn: DataFrame, cb: DataFrame, dim: int, m: int = PQ_M) -> DataFrame:
    """(vec_id, vn, *extra) -> (vec_id, *extra, codes): nearest codeword
    per subspace, IN-ROW against the broadcast codebooks — a stateless
    projection, no shuffle on the corpus. Non-``vn`` input columns pass
    through (IVFADC carries the cell id this way). codes is array<int>
    of length ``m``: ~8 ints per vector instead of 64 doubles, the
    100-TB candidate-scan I/O cut this exists for."""
    ds = dim // m
    carr = cb.agg(F.array_sort(F.collect_list(F.struct("sub", "code", "cv"))).alias("cbs"))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: -F.array_max(
            F.transform(
                F.filter(F.col("cbs"), lambda c: c["sub"] == s),
                lambda c: F.struct(
                    (-_l2sq(F.slice("vn", s * ds + 1, ds), c["cv"])).alias("nd"),
                    (-c["code"]).alias("nc"),
                ),
            )
        )["nc"],
    )
    keep = [c for c in e_vn.columns if c != "vn"]
    return e_vn.crossJoin(F.broadcast(carr)).select(*keep, codes.alias("codes"))


def _adc_table(ds: int) -> F.Column:
    """Per-query ADC table (Jegou et al. 2011 §IV): a map from
    ``sub * PQ_K + code`` to the dot product of the query's subvector
    (column ``qvn``) with that codeword, built ONCE per query row from
    the broadcast codebook array column ``cbs`` — scoring a candidate is
    then PQ_M map lookups + adds, never a full-dim dot."""
    return F.map_from_entries(
        F.transform(
            F.col("cbs"),
            lambda c: F.struct(
                (c["sub"] * PQ_K + c["code"]).alias("k"),
                _dot(F.slice("qvn", c["sub"] * ds + 1, ds), c["cv"]).alias("t"),
            ),
        )
    )


def _adc_score() -> F.Column:
    """Asymmetric-distance score of a coded candidate against the query's
    ADC table (columns ``codes`` / ``qmap``): the PQ_M table entries added
    left-to-right in subspace order — the same fold order the DuckDB
    oracles pin with ``list_sum(list(t ORDER BY sub))``."""
    return F.aggregate(
        F.transform(
            F.col("codes"), (lambda cd, s: F.element_at(F.col("qmap"), s * PQ_K + cd))
        ),
        F.lit(0.0),
        lambda a, t: a + t,
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str, rerank: int = PQ_RERANK) -> DataFrame:
    """ANN by product quantization with asymmetric distance computation
    (ADC) and exact rescoring — the third quantization tier next to
    ``ann_quantized_topk`` (int8 scalar) and IVF.

    Stage 1 (fit + encode): normalized vectors -> PQ_M x PQ_K codebooks
    -> 4-bit codes per subspace (the candidate table carries PQ_M small
    ints per vector, ~16x narrower than the float64 vectors). Stage 2
    (ADC): each query precomputes its dot-product TABLE against every
    codeword (PQ_M*PQ_K entries, a per-query map built once), so scoring
    a candidate is PQ_M map lookups + adds — never a full-dim dot.
    Stage 3: top ``rerank`` approximate candidates per query join back
    to full-precision vectors for exact cosine ranking, so emitted
    scores are exact and recall loss is confined past the rerank
    horizon (recall floor pinned in tests/test_simsearch_quality.py).

    100-TB shape: codebooks + query tables broadcast (PQ_M*PQ_K doubles
    per query); the scan side reads ONLY the codes table; the window is
    the same per-query top-rerank as the other ANN paths; full vectors
    are touched for Q x rerank rows only."""
    # the normalized checkpoint comes from the session-shared `_norm_ckpt`
    # memo (widened — the PQ fit + encode are HOF-heavy multi-pass
    # consumers, the same scan-starvation profile as the k-means fit);
    # plain PQ needs no coarse fit, so it shares only the checkpoint tier
    en, _n = _norm_ckpt(spark, sf_dir)
    # dim probe AFTER the checkpoint: first() on en reads a materialized
    # block instead of launching a widened-scan job per invocation
    dim = len(en.select("vn").first()["vn"])
    key = _memo_key(spark, sf_dir)
    hit = _PQ_CACHE.get(key)
    if hit is None:
        cb = _fit_pq_codebooks(en, dim)
        # checkpointed: repeated queries read ~PQ_M ints/vector instead
        # of re-running the interpreted encode argmin per call
        codes = pq_encode(en, cb, dim).localCheckpoint()
        _evict_stale(_PQ_CACHE, key)
        _PQ_CACHE[key] = hit = (cb, codes)
    cb, codes = hit

    ds = dim // PQ_M
    carr = cb.agg(F.array_sort(F.collect_list(F.struct("sub", "code", "cv"))).alias("cbs"))
    qbase = en.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "vn"
    )
    q = (
        qbase.select("query_id", F.col("vn").alias("qvn"))
        .crossJoin(F.broadcast(carr))
        .select("query_id", _adc_table(ds).alias("qmap"))
    )
    approx = codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).withColumn(
        "acos", _adc_score()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    cand = (
        approx.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "vec_id")
    )
    qv = qbase.select("query_id", F.col("vn").alias("qv"))
    scored = (
        cand.join(en, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", _dot(F.col("vn"), F.col("qv")))
    )
    wx = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wx))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def ann_ivfadc_topk(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = KM_NPROBE,
    rerank: int = PQ_RERANK,
) -> DataFrame:
    """IVFADC — the inverted-file + product-quantization composition of
    Jegou, Douze & Schmid (TPAMI 2011, §V): the coarse k-means quantizer
    routes each vector to a cell, PQ encodes the RESIDUAL (vector minus
    its cell's UNNORMALIZED mean — the mean is the least-squares-optimal
    anchor, so residual energy is the within-cell variance, strictly
    below the unit raw energy; subtracting the spherical unit-norm
    centroid instead OVERSHOOTS on weakly clustered data — measured
    residual energy 1.35 > 1 on the driver corpus, which is why FAISS's
    ``by_residual`` anchors on the quantizer's cell mean too), and a
    query scores only the vectors inside its ``nprobe`` nearest cells
    via ADC: ``dot(q, x) = dot(q, mean(x)) + dot(q, residual(x))`` —
    the decomposition holds exactly for ANY anchor; probe RANKING still
    uses the spherical centroids (direction is what cell nearness
    means), only the offset term switches to the mean. Scoring a
    candidate is PQ_M table lookups against the query's ADC table. Top
    ``rerank`` candidates rescore with exact cosine, so emitted scores
    are exact. This is the production large-scale ANN serving shape
    (FAISS ``IVFx,PQy``).

    Composition of two already-oracle-checked fits under one determinism
    contract: the spherical k-means of ``ann_ivf_kmeans`` (6-dp rounded
    centroids, first-KM_K init, ties to the smallest cid) and the
    per-subspace Lloyd of ``ann_pq_topk`` — here fitted on residuals
    (init = residuals of the PQ_K smallest vec_ids). The DuckDB oracle
    composes the same two unrolled CTE chains (`_ann_ivfadc_sql`).

    100-TB shape: the candidate scan reads ~PQ_M small ints per vector
    in the probed CELLS ONLY (with a materialized cell-partitioned codes
    table — the `build_ivf_index` layout — that is partition-pruned I/O:
    nprobe/K of the corpus, each row ~16x narrower than the float64
    vectors); centroids, codebooks and per-query ADC tables broadcast;
    full vectors are touched for Q x rerank rows only."""
    # coarse stage from the session-shared fit (`_fitted_cells`): the
    # normalized checkpoint, the count, and the spherical k-means are the
    # SAME artifacts ann_ivf_kmeans / dedup_semantic use — one fit per
    # session serves all three plus this composition
    en, n, cent, member = _fitted_cells(spark, sf_dir)
    dim = len(en.select("vn").first()["vn"])
    _oracle_scale_check(n)  # oracle unrolls exactly KM_K cells

    key = _memo_key(spark, sf_dir)
    hit = _IVFADC_CACHE.get(key)
    if hit is None:
        # unnormalized FINAL-cell means (6-dp rounded, the same
        # cross-engine determinism treatment as the centroids): one
        # narrow (cid, pos) agg over the corpus, K tiny rows out
        means = (
            member.select("cid", F.posexplode("vn").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: F.round(s["m"], 6),
                ).alias("cm")
            )
            .localCheckpoint()
        )
        # residual per vector: vn - mean(cid), computed map-side against
        # the broadcast means table; checkpointed because the PQ fit
        # makes PQ_ITERS + 1 passes over it
        resid = (
            member.join(F.broadcast(means), "cid")
            .select(
                "cid",
                "vec_id",
                F.zip_with("vn", "cm", lambda a, b: a - b).alias("vn"),
            )
            .localCheckpoint()
        )
        cb = _fit_pq_codebooks(resid.select("vec_id", "vn"), dim)
        # (cid, vec_id, codes) — cell carried; checkpointed so repeated
        # queries read ~PQ_M ints/vector instead of re-encoding
        codes = pq_encode(resid, cb, dim).localCheckpoint()
        _evict_stale(_IVFADC_CACHE, key)
        _IVFADC_CACHE[key] = hit = (means, cb, codes)
    means, cb, codes = hit

    q = en.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vn").alias("qvn")
    )
    # probe the nprobe nearest cells by SPHERICAL centroid direction,
    # then attach the offset term of the ADC decomposition: the query's
    # dot with the probed cell's unnormalized MEAN (the residual anchor)
    wq = Window.partitionBy("query_id").orderBy(F.desc("rdot"), F.asc("cid"))
    probe = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("rdot", _dot(F.col("qvn"), F.col("cv")))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .join(F.broadcast(means), "cid")
        .withColumn("qdot", _dot(F.col("qvn"), F.col("cm")))
        .select("query_id", F.col("cid").alias("cell"), "qdot")
    )
    ds = dim // PQ_M
    carr = cb.agg(F.array_sort(F.collect_list(F.struct("sub", "code", "cv"))).alias("cbs"))
    qmaps = (
        q.crossJoin(F.broadcast(carr))
        .select("query_id", _adc_table(ds).alias("qmap"))
    )
    pr = probe.join(qmaps, "query_id")  # Q x nprobe rows, both tiny

    approx = codes.join(
        F.broadcast(pr),
        (F.col("cid") == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("acos", F.col("qdot") + _adc_score())
    w = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    cand = (
        approx.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "vec_id", "cell")
    )
    qv = q.select("query_id", F.col("qvn").alias("qv"))
    scored = (
        cand.join(en, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("cosine", _dot(F.col("vn"), F.col("qv")))
    )
    wx = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wx))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            "rank",
            F.round("cosine", 6).alias("cosine"),
        )
    )


# SemDeDup threshold: the synthetic corpus' cross-pair cosines top out
# ~0.5 with a 99.9th percentile ~0.38, so 0.32 prunes a real (but small)
# high-similarity tail — the operator's semantics don't depend on the value
SEMDEDUP_THRESHOLD = 0.32


def dedup_semantic_vectors(
    vectors: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    k: int | None = None,
    target_cell_size: int = TARGET_CELL_SIZE,
    max_cell_size: int | None = None,
    return_losers: bool = False,
    oracle_strict: bool = False,
) -> DataFrame:
    """SemDeDup core over ANY unit-vector frame (vec_id, vn): k-means
    cluster, then WITHIN each cluster drop every vector whose cosine to a
    LOWER-vec_id cluster member reaches ``threshold`` — the deterministic
    keep-smallest-id variant of the paper's one-per-duplicate-group rule.
    Returns the KEPT (vec_id, cell) rows.

    SCALE CONTRACT: the only pair work is the within-cell self-join, so
    cell size bounds it. ``k`` defaults to ``km_k_for(N)`` — cluster
    count grows with the corpus (the paper's design point) instead of a
    fixed constant whose cells would grow O(N/K) and make the self-join
    quadratic. On top, any cell that STILL exceeds ``max_cell_size``
    (default ``MAX_CELL_FACTOR x target_cell_size``; k-means does not
    balance, so a skewed corpus can produce one) is deterministically
    hash-sub-split (``xxhash64(vec_id) mod ceil(size/max)``) and pairs
    are only compared within a sub-cell: pair work is bounded by
    ``max_cell_size**2`` per sub-cell AT THE COST of possibly missing
    near-dup pairs the hash separates — the same locality/recall trade
    the paper makes per cluster, taken one level further. The guard is a
    no-op (and adds zero plan nodes) when N <= max_cell_size, which
    covers every driver test scale, so oracles are unchanged.

    ``oracle_strict=True`` (set by the driver-table wrapper below, whose
    results are compared against the unrolled-``KM_K`` DuckDB SQL) raises
    a clear scale-contract error whenever the derived K or the sub-split
    guard would make this plan diverge from that SQL — instead of the
    divergence surfacing as an opaque value-hash diff in the parity gate.

    Composes with model-free embeddings: rename
    ``textstats.hash_embeddings`` output (doc_id -> vec_id, emb -> vn)
    and this is semantic TEXT dedup with no embeddings table at all.
    Centroid init = the ``k`` smallest vec_ids (deterministic for any id
    set; drop all-zero vectors upstream — they have no direction).
    EAGER like the line/substring passes: the checkpoint + N-count run
    at plan-construction time."""
    e = vectors.select("vec_id", "vn").localCheckpoint()
    n = e.count()  # cheap: e is checkpointed above
    if oracle_strict:
        _oracle_scale_check(n)
    if k is None:
        k = km_k_for(n, target_cell_size)
    if max_cell_size is None:
        max_cell_size = MAX_CELL_FACTOR * target_cell_size
    init = (
        e.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("vn").alias("cv"))
    )
    _cent, member = _fit_kmeans_cells(e, init=init, k=k)
    return _semdedup_prune(
        member.select("vec_id", "vn", "cid"),
        n,
        threshold,
        max_cell_size,
        return_losers=return_losers,
        oracle_strict=oracle_strict,
    )


def _semdedup_prune(
    m: DataFrame,
    n: int,
    threshold: float,
    max_cell_size: int,
    return_losers: bool = False,
    oracle_strict: bool = False,
    engine: str = "arrow",
) -> DataFrame:
    """The within-cell keep-smallest-id cosine prune over an assigned
    member frame (vec_id, vn, cid) — the pair-work half of SemDeDup,
    factored out so table wrappers can feed it the session-shared
    ``_fitted_cells`` fit instead of re-fitting.

    Two pair engines, measured A/B at sf1.0 (50k vectors, 16 cells of
    ~3.1k — ~156M candidate pairs):
    - ``engine="arrow"`` (default): one ``applyInPandas`` task per cell
      computes the Gram matrix in blocked numpy (BLAS matmul; the same
      kernel shape as ``dedup_embedding_cosine``'s blocked all-pairs) —
      the FAISS-style compute the SemDeDup paper assumes. ~3 s where the
      expression join took ~75 s: a 64-element interpreted ``aggregate``
      fold PER PAIR cannot compete with a matrix product.
    - ``engine="catalyst"``: the equi-join + per-pair HOF dot — kept as
      the cross-check (parity test + the DuckDB oracle pin both).
    Shuffle shape is identical (one exchange on the cell key); only the
    per-pair compute changes."""
    keys = ["cid"]
    if n > max_cell_size:  # some cell COULD exceed the bound: apply the guard
        sizes = (
            m.groupBy("cid")
            .agg(F.ceil(F.count(F.lit(1)) / max_cell_size).cast("int").alias("nsplit"))
        )
        if oracle_strict and sizes.agg(F.max("nsplit")).first()[0] > 1:
            # a sub-split drops pairs the unrolled-K SQL keeps — fail loud
            # instead of surfacing as an opaque parity diff
            raise RuntimeError(
                "oracle scale contract exceeded: a k-means cell exceeds "
                f"max_cell_size={max_cell_size} and would be hash-sub-split, "
                "which the registered DuckDB oracle (unsplit cells) cannot "
                "follow. Use dedup_semantic_vectors directly at scale."
            )
        m = m.join(F.broadcast(sizes), "cid").withColumn(
            "sub",
            F.when(F.col("nsplit") <= 1, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("vec_id"), F.col("nsplit")).cast("int")
            ),
        )
        keys = ["cid", "sub"]
    if engine == "arrow":
        import pandas as pd

        def cell_losers(pdf):
            ids = pdf["vec_id"].to_numpy()
            mat = np.stack(pdf["vn"].to_numpy())
            is_loser = np.zeros(len(ids), dtype=bool)
            # blocked Gram product: bounds task memory at BLK x cell
            BLK = 2048
            for i in range(0, len(ids), BLK):
                sims = mat[i : i + BLK] @ mat.T
                mask = (sims >= threshold) & (ids[i : i + BLK, None] < ids[None, :])
                is_loser |= mask.any(axis=0)
            return pd.DataFrame({"vec_id": ids[is_loser]})

        losers = m.groupBy(*keys).applyInPandas(cell_losers, "vec_id long").distinct()
    elif engine == "catalyst":
        a = m.select(F.col("vec_id").alias("a_id"), F.col("vn").alias("a_vn"), *keys)
        b = m.select(F.col("vec_id").alias("b_id"), F.col("vn").alias("b_vn"), *keys)
        losers = (
            a.join(b, keys)
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(_dot(F.col("a_vn"), F.col("b_vn")) >= F.lit(threshold))
            .select(F.col("b_id").alias("vec_id"))
            .distinct()
        )
    else:
        raise ValueError(f"unknown engine {engine!r}: use 'arrow' or 'catalyst'")
    if return_losers:
        # the small complement — the frame a pipeline BROADCASTS into its
        # corpus anti-join (the kept set is nearly the whole corpus and
        # must never be the broadcast side)
        return losers
    return (
        m.join(losers, "vec_id", "left_anti")
        .select("vec_id", F.col("cid").alias("cell"))
    )


def dedup_semantic(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = SEMDEDUP_THRESHOLD,
    return_losers: bool = False,
) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023, public)
    over the embeddings table: k-means cluster the normalized embeddings
    (the exact ``_fit_kmeans_cells`` fit ``ann_ivf_kmeans`` uses, same
    determinism contract), then the within-cell keep-smallest-id cosine
    prune (``dedup_semantic_vectors`` above).

    100-TB shape: the only pair work is the within-cell self-join —
    cells bound the candidate space exactly as in the paper, and the
    cluster count is DERIVED from the corpus (``km_k_for``: K ≈ N/4096,
    floored at KM_K so driver-scale oracles stay deterministic) with a
    hash-sub-split guard on skew-oversized cells; the join is an
    equi-join on (cid[, sub]), no global all-pairs. Clustering costs are
    shared with the IVF index build, so a corpus pipeline fits once and
    both serves ANN and semantically dedups from the same cells."""
    # oracle_strict: this wrapper is the one compared against the
    # unrolled-KM_K DuckDB SQL — fail loud past the driver-scale contract.
    # The fit comes from the session-shared `_fitted_cells` memo (same
    # centroids ann_ivf_kmeans serves from — ids are contiguous from 0 on
    # this table, so the default vec_id<k init IS the k smallest ids).
    _e, n, _cent, member = _fitted_cells(spark, sf_dir)
    _oracle_scale_check(n)
    return _semdedup_prune(
        member.select("vec_id", "vn", "cid"),
        n,
        threshold,
        MAX_CELL_FACTOR * TARGET_CELL_SIZE,
        return_losers=return_losers,
        oracle_strict=True,
    )


def _semdedup_sql(threshold: float = SEMDEDUP_THRESHOLD) -> str:
    return (
        _kmeans_cells_cte()
        + f""",
losers AS (
  SELECT DISTINCT b.vec_id
  FROM cells a
  JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN n na ON na.vec_id = a.vec_id
  JOIN n nb ON nb.vec_id = b.vec_id
  WHERE list_dot_product(na.vn, nb.vn) >= {threshold}
)
SELECT c.vec_id, c.cid AS cell
FROM cells c
WHERE c.vec_id NOT IN (SELECT vec_id FROM losers)
"""
    )


# r12 rotation: the brute-force baseline (stable since r2) moves to the
# pytest gate; ann_knn_join (two-table retrieval, never window-checked)
# takes the slot — see the PYTEST_ORACLES assignments below.
QUERIES = {
    "ann_lsh_cosine": ann_lsh_cosine,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_kmeans": ann_ivf_kmeans,
    "embedding_label_centroids": embedding_label_centroids,
}

ORACLES = {
    "ann_lsh_cosine": _ann_lsh_sql(),
    "ann_ivf_topk": _ann_ivf_sql(1),
    "ann_ivf_kmeans": _ann_ivf_kmeans_sql(KM_NPROBE),
    "embedding_label_centroids": _CENTROID_SQL,
}

# subvector squared-L2 via list_zip: element order preserved, so ties and
# magnitudes match Spark's left-to-right zip_with fold
_PQ_D2 = "list_sum(list_transform(list_zip(v.sv, c.cv), z -> (z[1] - z[2]) * (z[1] - z[2])))"


def _pq_lloyd_ctes() -> str:
    """The unrolled per-subspace Lloyd CTE chain over a preceding
    ``sv``(vec_id, sub, sv) CTE — shared by the PQ and IVFADC oracles
    (IVFADC's sv carries residual subvectors and an extra cid column the
    chain ignores). Emits ``,p0 ... ,p{PQ_ITERS}``; callers read final
    codebooks from ``p{PQ_ITERS}``. Same contract as the Spark fit:
    init = subvectors of the PQ_K smallest vec_ids, 6-dp rounding per
    iteration, distance ties to the smallest code."""
    sql = f""",
p0 AS (SELECT sub, CAST(vec_id AS INT) AS code, sv AS cv FROM sv WHERE vec_id < {PQ_K})"""
    prev = "p0"
    for i in range(1, PQ_ITERS + 1):
        sql += f""",
pa{i} AS (
  SELECT vec_id, sub, code FROM (
    SELECT v.vec_id, v.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
                              ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM sv v JOIN {prev} c ON c.sub = v.sub
  ) WHERE r = 1),
pm{i} AS (
  SELECT a.sub, a.code, generate_subscripts(v.sv, 1) AS pos, unnest(v.sv) AS x
  FROM sv v JOIN pa{i} a ON v.vec_id = a.vec_id AND v.sub = a.sub),
pd{i} AS (SELECT sub, code, pos, AVG(x) AS mu FROM pm{i} GROUP BY 1, 2, 3),
p{i} AS (
  SELECT sub, code, list_transform(list(mu ORDER BY pos), x -> ROUND(x, 6)) AS cv
  FROM pd{i} GROUP BY sub, code)"""
        prev = f"p{i}"
    return sql


def _ann_pq_sql(rerank: int = PQ_RERANK, dim: int = 64) -> str:
    """DuckDB oracle for ``ann_pq_topk`` — the per-subspace Lloyd fit
    unrolled exactly like ``_kmeans_cells_cte`` (sub is one more group
    key), then encode, the per-query ADC table, and exact rescoring.
    Determinism: subvector L2 via ``list_zip`` keeps element order, the
    ADC sum is ``list_sum(list(t ORDER BY sub))`` so both engines add
    the PQ_M table entries in subspace order, and centroids round to 6
    decimals per iteration — the same cross-engine contract as IVF."""
    ds = dim // PQ_M
    prev = f"p{PQ_ITERS}"
    sql = f"""
WITH n0 AS ({_EMB_SQL}),
n AS (SELECT vec_id, list_transform(v, x -> x / norm) AS vn FROM n0),
sv AS (SELECT vec_id, s.s AS sub, vn[(s.s*{ds}+1):(s.s*{ds}+{ds})] AS sv
       FROM n, (SELECT unnest(range(0, {PQ_M})) AS s) s)"""
    sql += _pq_lloyd_ctes()
    sql += f""",
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT v.vec_id, v.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
                              ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM sv v JOIN {prev} c ON c.sub = v.sub
  ) WHERE r = 1),
q AS (SELECT vec_id AS query_id, vn AS qvn FROM n WHERE vec_id < {N_QUERIES}),
qt AS (
  SELECT q.query_id, c.sub, c.code,
         list_dot_product(q.qvn[(c.sub*{ds}+1):(c.sub*{ds}+{ds})], c.cv) AS t
  FROM q CROSS JOIN {prev} c),
acand AS (
  SELECT query_id, vec_id FROM (
    SELECT t.query_id, k.vec_id,
           ROW_NUMBER() OVER (PARTITION BY t.query_id
                              ORDER BY list_sum(list(t.t ORDER BY t.sub)) DESC,
                                       k.vec_id ASC) AS arank
    FROM codes k JOIN qt t ON t.sub = k.sub AND t.code = k.code
    WHERE k.vec_id != t.query_id
    GROUP BY t.query_id, k.vec_id
  ) WHERE arank <= {rerank})
SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT a.query_id, n.vec_id AS neighbor_id,
         list_dot_product(n.vn, q.qvn) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.query_id
                            ORDER BY list_dot_product(n.vn, q.qvn) DESC, n.vec_id ASC) AS rank
  FROM acand a JOIN n ON n.vec_id = a.vec_id
  JOIN q ON q.query_id = a.query_id
)
WHERE rank <= {TOP_K}
"""
    return sql


def _ann_ivfadc_sql(
    nprobe: int = KM_NPROBE, rerank: int = PQ_RERANK, dim: int = 64
) -> str:
    """DuckDB oracle for ``ann_ivfadc_topk`` — the k-means cell CTE chain
    (`_kmeans_cells_cte`), the 6-dp-rounded unnormalized final-cell means
    (the residual anchor), residual subvectors into the shared
    per-subspace Lloyd chain (`_pq_lloyd_ctes`), then the probed-cell ADC
    scoring ``qdot + list_sum(list(t ORDER BY sub))`` (the mean-offset
    term added OUTSIDE the subspace-ordered sum, exactly Spark's
    ``qdot + _adc_score()``) and exact rescoring."""
    ds = dim // PQ_M
    kprev = f"c{KM_ITERS}"
    pprev = f"p{PQ_ITERS}"
    sql = _kmeans_cells_cte()
    sql += f""",
fm AS (
  SELECT cells.cid, generate_subscripts(n.vn, 1) AS pos, unnest(n.vn) AS x
  FROM n JOIN cells ON n.vec_id = cells.vec_id),
fd AS (SELECT cid, pos, AVG(x) AS m FROM fm GROUP BY 1, 2),
cmn AS (
  SELECT cid, list_transform(list(m ORDER BY pos), x -> ROUND(x, 6)) AS cm
  FROM fd GROUP BY cid),
r AS (
  SELECT n.vec_id, cells.cid,
         list_transform(list_zip(n.vn, c.cm), z -> z[1] - z[2]) AS rv
  FROM n JOIN cells ON n.vec_id = cells.vec_id
  JOIN cmn c ON cells.cid = c.cid
),
sv AS (SELECT vec_id, cid, s.s AS sub, rv[(s.s*{ds}+1):(s.s*{ds}+{ds})] AS sv
       FROM r, (SELECT unnest(range(0, {PQ_M})) AS s) s)"""
    sql += _pq_lloyd_ctes()
    sql += f""",
codes AS (
  SELECT vec_id, cid, sub, code FROM (
    SELECT v.vec_id, v.cid, v.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub
                              ORDER BY {_PQ_D2} ASC, c.code ASC) AS r
    FROM sv v JOIN {pprev} c ON c.sub = v.sub
  ) WHERE r = 1),
q AS (SELECT vec_id AS query_id, vn AS qvn FROM n WHERE vec_id < {N_QUERIES}),
probe AS (
  SELECT p.query_id, p.cell, list_dot_product(p.qvn, m.cm) AS qdot FROM (
    SELECT q.query_id, q.qvn, c.cid AS cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qvn, c.cv) DESC, c.cid ASC) AS crank
    FROM q CROSS JOIN {kprev} c
  ) p JOIN cmn m ON p.cell = m.cid
  WHERE p.crank <= {nprobe}
),
qt AS (
  SELECT q.query_id, c.sub, c.code,
         list_dot_product(q.qvn[(c.sub*{ds}+1):(c.sub*{ds}+{ds})], c.cv) AS t
  FROM q CROSS JOIN {pprev} c),
acand AS (
  SELECT query_id, vec_id, cell FROM (
    SELECT p.query_id, k.vec_id, p.cell,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                              ORDER BY p.qdot + list_sum(list(t.t ORDER BY t.sub)) DESC,
                                       k.vec_id ASC) AS arank
    FROM codes k
    JOIN probe p ON k.cid = p.cell
    JOIN qt t ON t.query_id = p.query_id AND t.sub = k.sub AND t.code = k.code
    WHERE k.vec_id != p.query_id
    GROUP BY p.query_id, k.vec_id, p.cell, p.qdot
  ) WHERE arank <= {rerank})
SELECT query_id, neighbor_id, cell, rank, ROUND(cosine, 6) AS cosine
FROM (
  SELECT a.query_id, n.vec_id AS neighbor_id, a.cell,
         list_dot_product(n.vn, q.qvn) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.query_id
                            ORDER BY list_dot_product(n.vn, q.qvn) DESC, n.vec_id ASC) AS rank
  FROM acand a JOIN n ON n.vec_id = a.vec_id
  JOIN q ON q.query_id = a.query_id
)
WHERE rank <= {TOP_K}
"""
    return sql


# registry is capped at 50 driver entries: semantic dedup and PQ carry
# their oracles through the pytest gate instead
PYTEST_ORACLES = {
    "ann_filtered_topk": (ann_filtered_topk, _ANN_FILTERED_SQL),
    "dedup_semantic": (dedup_semantic, _semdedup_sql()),
    "ann_pq_topk": (ann_pq_topk, _ann_pq_sql()),
    "ann_ivfadc_topk": (ann_ivfadc_topk, _ann_ivfadc_sql()),
}


# -- embedding outlier scan ----------------------------------------------------

OUTLIER_Z = 2.0  # flag vectors this many label-stddevs below the mean cohesion


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: vectors whose cosine to their OWN
    label's centroid sits ``OUTLIER_Z`` standard deviations below the
    label's mean cohesion — the mislabeled/garbage-vector scan you run
    before trusting labels for IVF lists, SemDeDup cells, or supervised
    fine-tuning slices.

    Scale shape: the corpus is touched twice, both times narrowly — one
    explode -> (label, pos) hash agg builds the centroid table
    (label x dim, tiny, map-side combine), then ONE broadcast join puts
    each row's centroid array alongside it and the cosine is a pure in-row
    fold (zip_with/aggregate, whole-stage codegen, no Python). The z-stats
    are a per-label aggregate (labels-sized, broadcast back). No pairwise
    anything; cost is two corpus scans + label-sized tables.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("v")
    )
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t
        )

    scored = (
        e.join(F.broadcast(cent), "label")
        .withColumn(
            "cos",
            _dot(F.col("v"), F.col("cv"))
            / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        )
        .select("vec_id", "label", "cos")
    )
    stats = scored.groupBy("label").agg(
        F.avg("cos").alias("mu"), F.stddev_pop("cos").alias("sigma")
    )
    # try_divide: a zero-variance label yields NULL z (nothing flaggable),
    # not an ANSI divide-by-zero; the oracle mirrors with NULLIF
    z = F.try_divide(F.col("cos") - F.col("mu"), F.col("sigma"))
    return (
        scored.join(F.broadcast(stats), "label")
        .withColumn("z", z)
        .filter(F.col("z") <= -OUTLIER_Z)
        .select(
            "vec_id",
            "label",
            F.round("cos", 6).alias("cos_centroid"),
            F.round("z", 6).alias("z_score"),
        )
    )


_EMB_OUTLIER_SQL = f"""
WITH t AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
pos AS (
  SELECT label, unnest(v) AS x, generate_subscripts(v, 1) - 1 AS pos FROM t
),
c AS (SELECT label, pos, AVG(x) AS m FROM pos GROUP BY 1, 2),
carr AS (SELECT label, list(m ORDER BY pos) AS cv FROM c GROUP BY 1),
scored AS (
  SELECT t.vec_id, t.label,
         list_dot_product(t.v, carr.cv)
           / (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(carr.cv, carr.cv))) AS cos
  FROM t JOIN carr USING (label)
),
z AS (
  SELECT vec_id, label, cos,
         (cos - AVG(cos) OVER (PARTITION BY label))
           / NULLIF(stddev_pop(cos) OVER (PARTITION BY label), 0) AS z
  FROM scored
)
SELECT vec_id, label, ROUND(cos, 6) AS cos_centroid, ROUND(z, 6) AS z_score
FROM z WHERE z <= -{OUTLIER_Z}
"""

PYTEST_ORACLES["embedding_outliers"] = (embedding_outliers, _EMB_OUTLIER_SQL)


# -- batch kNN join -------------------------------------------------------------
#
# The two-table retrieval shape: for EVERY row of a query table, the top-k
# cosine neighbors from a (much larger) corpus table — kNN evaluation,
# retrieval-augmented labeling, cross-lake record linkage. ann_cosine_topk
# is the self-join special case with a fixed corpus-prefix query set; this
# is the generic operator.
#
# 100-TB shape: the query side is the small one by construction (size-gated
# like the embedding-decontamination eval matrix); it is collected once,
# normalized, and broadcast as a dense numpy matrix. The corpus streams
# through ONE Arrow mapInPandas pass computing a (batch x n_queries) matmul
# and a per-batch STABLE top-k per query — so the shuffled candidate frame
# is (n_partition_batches x n_queries x k) rows, never the |corpus| x
# |queries| cross product the window-over-join formulation would move. A
# global per-query top-k over the candidates finishes the merge (top-k of a
# union == top-k of per-chunk top-k under a total order). Query sets past
# the gate belong on the IVF index path (build_ivf_index + ann_ivf_query).

KNN_JOIN_QUERY_LIMIT = 100_000


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = TOP_K,
    query_limit: int = KNN_JOIN_QUERY_LIMIT,
) -> DataFrame:
    """(query_id, embedding) x (vec_id, embedding) -> per-query top-k:
    (query_id, neighbor_id, rank, cosine 6dp). Determinism contract (the
    same one the other ANN oracles pin): the cosine is computed in the
    oracle's op order — dot of RAW vectors divided by the norm product,
    not normalize-then-dot — and every ranking stage (per-batch candidate
    top-k AND the global winnow) orders by the 6dp-ROUNDED cosine with
    neighbor_id ASC tie-break, so near-tie candidates order identically
    across engines whenever the rounded cosines agree (the shared
    cross-engine margin). The only residual is matmul accumulation order
    inside one dot product, sub-1e-12 against a 1e-6 grid."""
    import pandas as pd

    spark = queries.sparkSession
    out_schema = "query_id long, neighbor_id long, cosine double"
    n_q = queries.count()
    if n_q == 0:
        return spark.createDataFrame([], out_schema).select(
            "query_id", "neighbor_id", F.lit(0).alias("rank"), "cosine"
        )
    if n_q > query_limit:
        raise ValueError(
            f"query side has {n_q} rows > query_limit={query_limit}: the dense "
            "broadcast matrix would tax the driver/executors — build_ivf_index "
            "+ ann_ivf_query is the path for query sets this large, or raise "
            "query_limit explicitly"
        )
    rows = queries.select("query_id", "embedding").orderBy("query_id").collect()
    qids = np.array([r["query_id"] for r in rows], dtype=np.int64)
    qmat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm = np.where(qnorm == 0.0, 1.0, qnorm)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def part_topk(batches):
        ids_q, mq, nq = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vec_id-ascending batch order + stable sort == neighbor_id ASC
            # tie-break on equal (rounded) cosines (duplicate vectors are
            # real in deduplication corpora, so ties DO happen)
            pdf = pdf.sort_values("vec_id")
            vids = pdf["vec_id"].to_numpy()
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norm = np.linalg.norm(m, axis=1)
            norm = np.where(norm == 0.0, 1.0, norm)
            # oracle op order: raw dot, then divide by the norm product
            sims = (m @ mq.T) / (norm[:, None] * nq[None, :])  # (batch, n_q)
            sims = np.round(sims, 6)
            kk = min(k, len(pdf))
            top = np.argsort(-sims, axis=0, kind="stable")[:kk]  # (kk, n_q)
            qcol = np.repeat(ids_q, kk)
            ncol = vids[top].T.ravel()
            ccol = np.take_along_axis(sims, top, axis=0).T.ravel()
            yield pd.DataFrame(
                {"query_id": qcol, "neighbor_id": ncol, "cosine": ccol}
            )

    cand = corpus.select("vec_id", "embedding").mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cosine"))
    )


def ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the first N_QUERIES vectors as the query table, the
    REST of the lake as the corpus (disjoint two-table retrieval — unlike
    ann_cosine_topk's self-join, the query rows are not corpus members)."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_join(q, e.filter(F.col("vec_id") >= N_QUERIES))


_KNN_JOIN_SQL = f"""
WITH n AS ({_EMB_SQL})
SELECT query_id, neighbor_id, rank, cosine
FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_dot_product(e.v, q.v) / (e.norm * q.norm), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND(list_dot_product(e.v, q.v) / (e.norm * q.norm), 6) DESC,
                                     e.vec_id ASC) AS rank
  FROM n e JOIN n q ON q.vec_id < {N_QUERIES} AND e.vec_id >= {N_QUERIES}
)
WHERE rank <= {TOP_K}
"""

PYTEST_ORACLES["ann_cosine_topk"] = (ann_cosine_topk, _ANN_TOPK_SQL)
QUERIES["ann_knn_join"] = ann_knn_join
ORACLES["ann_knn_join"] = _KNN_JOIN_SQL
