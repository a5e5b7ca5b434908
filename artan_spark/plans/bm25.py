"""BM25 full-text retrieval over the documents table (Robertson et al.,
TREC-3 Okapi; the idf variant is Lucene's non-negative form) — the lexical
retrieval companion to the embedding ANN paths: same "top-k per query"
output contract, driven entirely by an inverted-index equi-join.

100-TB shape: the postings list (term, doc_id, tf) is ONE explode +
partial agg over the corpus; df/idf is a vocab-sized agg; the query-term
table is tiny and BROADCAST into the postings join, so candidate
generation touches only postings of query terms (the inverted-index read
pattern — never a corpus x query cross product); the per-query top-k
window sorts only matched candidates. The reference engine has no text
retrieval; this is beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from artan_spark.sources import read_table, read_table_wide

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5
BM25_N_QUERIES = 5  # queries = the distinct token sets of doc_id < 5

# session memo for the postings-list fit (doc_id, term, tf): the inverted
# index every BM25 scoring pass probes. One corpus explode + partial agg
# per (appId, path, freshness-token) — the ANN persisted-index idea
# applied in-session; dl/df/idf all DERIVE from it (dl = sum of tf per
# doc, exact long arithmetic), so the scoring join still runs per
# invocation against per-query terms.
_BM25_TF_CACHE: dict[tuple, DataFrame] = {}


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = BM25_TOP_K,
    memo_key: tuple | None = None,
) -> DataFrame:
    """Score ``queries`` (query_id, term — one row per query term) against
    ``docs`` (doc_id, text) and return the top-``top_k`` docs per query by
    BM25.

    score(D, Q) = sum over shared terms of
        idf(t) * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  [always >= 0].

    Determinism: scores round to 6 dp and ties break on doc_id ASC, the
    same contract as the ANN top-k paths; operand order is parenthesized
    identically in the DuckDB oracle."""
    tf = _BM25_TF_CACHE.get(memo_key) if memo_key is not None else None
    if tf is None:
        toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
        base = docs.select("doc_id", F.explode(toks).alias("term"))
        tf = base.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        if memo_key is not None:
            from artan_spark.plans.simsearch import _evict_stale

            tf = tf.localCheckpoint()
            _evict_stale(_BM25_TF_CACHE, memo_key)
            _BM25_TF_CACHE[memo_key] = tf
    # dl is the per-doc token count = the tf sum per doc (exact long
    # arithmetic — same values as counting the raw token stream), so the
    # whole model derives from the postings fit without a second explode
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    part = (
        tf.join(F.broadcast(queries), "term")  # inverted-index probe
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    scored = part.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("part"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "rank", "score")
    )


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table wrapper: each of the first ``BM25_N_QUERIES`` docs is
    a query (its DISTINCT tokens), scored against the whole corpus. NOTE
    self-retrieval is NOT guaranteed to win on the word-soup corpus (all
    docs share the Zipfian vocabulary, so a doc dense in the query's
    high-idf terms can out-score the query doc under length
    normalization); correctness is pinned by the DuckDB oracle plus a
    plain-Python replay in tests."""
    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    queries = (
        d.filter(F.col("doc_id") < BM25_N_QUERIES)
        .select(F.col("doc_id").alias("query_id"), F.explode(toks).alias("term"))
        .distinct()
    )
    import os

    from artan_spark.sources import _path_token

    path = os.path.join(sf_dir, "documents.parquet")
    key = (spark.sparkContext.applicationId, f"{path}#bm25-tf", _path_token(path))
    return bm25_topk(d, queries, memo_key=key)


_BM25_SQL = f"""
WITH base AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM base GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM base GROUP BY 1),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idf AS (
  SELECT term, ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) AS idf, s.avgdl
  FROM df CROSS JOIN stats s
),
queries AS (
  SELECT DISTINCT doc_id AS query_id, term FROM base WHERE doc_id < {BM25_N_QUERIES}
),
part AS (
  SELECT q.query_id, tf.doc_id,
         idf.idf * (tf.tf * {BM25_K1 + 1.0}) /
           (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / idf.avgdl)) AS part
  FROM tf
  JOIN queries q ON q.term = tf.term
  JOIN idf ON idf.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
),
scored AS (
  SELECT query_id, doc_id, ROUND(SUM(part), 6) AS score
  FROM part GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, rank, score
FROM ranked WHERE rank <= {BM25_TOP_K}
"""


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES = {
    "docs_bm25_topk": (docs_bm25_topk, _BM25_SQL),
}
