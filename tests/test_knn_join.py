"""Batch kNN join: the partial-top-k merge is EXACT (equals the
window-over-full-join formulation at any corpus partitioning), ties break
to the smallest neighbor_id even across partition boundaries, and the
query-side size gate raises actionably."""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.simsearch import N_QUERIES, TOP_K, knn_join
from artan_spark.sources import read_table

from conftest import SF_DIR


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v)


def _brute(q, c, k):
    from pyspark.sql.window import Window

    qv = q.select(F.col("query_id"), F.col("embedding").alias("qe"))
    cos = _dot(
        F.transform("embedding", lambda v: v.cast("double")),
        F.transform("qe", lambda v: v.cast("double")),
    ) / (
        F.sqrt(_dot(F.transform("embedding", lambda v: v.cast("double")),
                    F.transform("embedding", lambda v: v.cast("double"))))
        * F.sqrt(_dot(F.transform("qe", lambda v: v.cast("double")),
                      F.transform("qe", lambda v: v.cast("double"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        c.crossJoin(F.broadcast(qv))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank",
                F.round("cosine", 6).alias("cosine"))
    )


def test_partial_topk_merge_is_exact_across_partitionings(spark):
    e = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES)
    want = sorted(
        tuple(r) for r in _brute(q, c, TOP_K).collect()
    )
    for parts in (1, 7):
        got = sorted(tuple(r) for r in knn_join(q, c.repartition(parts), TOP_K).collect())
        assert got == want, f"partitioning {parts} changed the result"


def test_duplicate_vector_ties_break_to_smallest_id(spark):
    # three IDENTICAL corpus vectors, ids chosen to land in different
    # partitions; k=2 must pick the two smallest ids
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, embedding array<double>")
    c = spark.createDataFrame(
        [(30, [1.0, 0.0]), (10, [1.0, 0.0]), (20, [1.0, 0.0]), (5, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    ).repartition(3)
    out = knn_join(q, c, k=2).orderBy("rank").collect()
    assert [(r.neighbor_id, r.rank) for r in out] == [(10, 1), (20, 2)]


def test_empty_queries_and_size_gate(spark):
    c = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    empty_q = spark.createDataFrame([], "query_id long, embedding array<double>")
    assert knn_join(empty_q, c).count() == 0
    q = spark.createDataFrame([(i, [1.0]) for i in range(3)],
                              "query_id long, embedding array<double>")
    with pytest.raises(ValueError, match="query_limit"):
        knn_join(q, c, query_limit=2)
