"""Cross-corpus MinHash-LSH similarity join + the near-dup decontamination
query it powers — the bridge between the two existing decontamination
paths: exact n-gram overlap (``docs_decontaminate``, misses paraphrase-ish
edits) and embedding cosine (``docs_decontaminate_embedding``, needs
vectors). MinHash near-dup is the classic middle: it catches
lightly-edited copies of eval documents inside the train split at LSH
cost, no embeddings required — the GPT-3 "13-gram overlap" and Gopher
dedup-against-eval stage generalized to fuzzy matches.

Semantics: a (test, train) pair is a CANDIDATE iff any MinHash LSH band
bucket contains both documents (the identical criterion, permutations, and
band layout as ``dedup_minhash_lsh`` — one shared definition); a candidate
is CONTAMINATED iff its exact word-3-gram Jaccard >= 0.5. The Jaccard
test is evaluated as the integer comparison ``2*|A∩B| >= |A∪B|`` — no
float division, no rounding, so the oracle parity is exact by construction
(no margin guard needed; the strip-and-measure regime has nothing to
measure).

Scale design (the 100-TB shape):
- band signatures are the row-wise ``minhash_bands`` projection on each
  side — one scan per corpus, no explode+groupBy shuffle;
- the candidate join is the banded equi-join on (band, sig): bucket-local
  pairs, never |test| x |train|;
- exact verification re-reads ONLY candidate documents (semi-join
  pushdown), so its cost tracks the candidate count, not the corpus;
- nothing here is a self-join: the two sides can be different tables
  (daily batch vs eval suite, corpus A vs corpus B).

The reference engine (ozancicek/artan) has no counterpart; beyond-reference
surface (the SURVEY §2 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.dedup import _SHINGLES_SQL, _minhash_sql, shingles_of
from artan_spark.plans.sampling import _BUCKETS, _TRAIN, _VAL, _hash_bucket
from artan_spark.sources import read_table_wide

JACCARD_NUM, JACCARD_DEN = 1, 2  # contamination threshold 1/2, exact rational


def minhash_similarity_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_right: bool = False,
) -> DataFrame:
    """LSH candidate pairs BETWEEN two document frames: (left_id, right_id)
    for every pair sharing at least one MinHash band bucket. Unlike
    ``dedup_minhash_lsh`` this is not a self-join — the sides are distinct
    corpora and no id ordering is imposed.

    Pass ``broadcast_right=True`` only when the right side is genuinely
    small (a benchmark eval suite, not a split of the corpus): its band
    frame is ~4 rows/doc x ~50 B.
    """
    # inside-function import: streaming.neardup imports plans.dedup, and the
    # plans package __init__ imports THIS module — a top-level import here
    # would close that cycle (the neardup_store lesson, round 10).
    from artan_spark.streaming.neardup import minhash_bands

    lb = minhash_bands(left, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("left_id"), "band", "sig"
    )
    rb = minhash_bands(right, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("right_id"), "band", "sig"
    )
    if broadcast_right:
        rb = F.broadcast(rb)
    return lb.join(rb, ["band", "sig"]).select("left_id", "right_id").distinct()


def crosscorpus_neardup(
    probe: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verified near-dup report of ``probe`` documents against ``corpus``:
    one row per LSH candidate pair with exact integer overlap evidence —
    (probe_id, corpus_id, n_inter, n_union, is_contaminated) where
    ``is_contaminated = (2 * n_inter >= n_union)`` i.e. Jaccard >= 0.5.

    Verification cost is candidate-bounded: shingle sets are built only
    for documents that appear in a candidate pair (semi-join pushdown into
    the parquet scan at the source)."""
    cand = minhash_similarity_join(probe, corpus, id_col, text_col).select(
        F.col("left_id").alias("probe_id"), F.col("right_id").alias("corpus_id")
    )
    # shingles of candidate docs ONLY (each side separately: ids can
    # overlap across frames without meaning the same document)
    p_sh = shingles_of(
        probe.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).join(
            cand.select(F.col("probe_id").alias("doc_id")).distinct(), "doc_id", "semi"
        )
    ).select(F.col("doc_id").alias("probe_id"), "shingle")
    c_sh = shingles_of(
        corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).join(
            cand.select(F.col("corpus_id").alias("doc_id")).distinct(), "doc_id", "semi"
        )
    ).select(F.col("doc_id").alias("corpus_id"), "shingle")

    inter = (
        cand.join(p_sh, "probe_id")
        .join(c_sh, ["corpus_id", "shingle"])
        .groupBy("probe_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    p_n = p_sh.groupBy("probe_id").agg(F.count(F.lit(1)).alias("na"))
    c_n = c_sh.groupBy("corpus_id").agg(F.count(F.lit(1)).alias("nb"))
    o = F.coalesce(F.col("o"), F.lit(0))
    u = F.col("na") + F.col("nb") - o
    return (
        cand.join(inter, ["probe_id", "corpus_id"], "left")
        .join(p_n, "probe_id")
        .join(c_n, "corpus_id")
        .select(
            "probe_id",
            "corpus_id",
            o.alias("n_inter"),
            u.alias("n_union"),
            (F.lit(JACCARD_DEN) * o >= F.lit(JACCARD_NUM) * u).alias("is_contaminated"),
        )
    )


def docs_decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup decontamination of the held-out split: every LSH candidate
    (test, train) pair under the shared 80/10/10 hash split, with exact
    integer Jaccard evidence. Columns: test_doc_id, train_doc_id, n_inter,
    n_union, is_contaminated.

    Unlike the generic two-frame ``crosscorpus_neardup``, both "corpora"
    here are splits of ONE table, so the whole query costs exactly TWO
    corpus passes (plan-audited: the naive branching form re-scanned the
    parquet 16x):
    1. the tagged bands pass, CHECKPOINTED (~50 B/doc of signatures — the
       dedup_ngram_jaccard docsets pattern) so the test/train branches and
       every candidate reuse derive from the materialization;
    2. one shingle pass over CANDIDATE docs only (semi-join pushdown),
       checkpointed and shared by both sides of the verification —
       candidate-pair-bounded, not corpus-bounded."""
    from artan_spark.streaming.neardup import minhash_bands

    docs = read_table_wide(spark, sf_dir, "documents")
    bands = (
        minhash_bands(docs)
        .withColumn("__b__", _hash_bucket(F.col("doc_id")))
        .localCheckpoint()
    )
    tb = bands.filter(F.col("__b__") >= _VAL).select(
        F.col("doc_id").alias("test_doc_id"), "band", "sig"
    )
    rb = bands.filter(F.col("__b__") < _TRAIN).select(
        F.col("doc_id").alias("train_doc_id"), "band", "sig"
    )
    cand = (
        tb.join(rb, ["band", "sig"])
        .select("test_doc_id", "train_doc_id")
        .distinct()
        .localCheckpoint()
    )

    cand_ids = (
        cand.select(F.col("test_doc_id").alias("doc_id"))
        .union(cand.select(F.col("train_doc_id").alias("doc_id")))
        .distinct()
    )
    csh = shingles_of(docs.join(cand_ids, "doc_id", "semi")).localCheckpoint()
    t_sh = csh.join(
        cand.select(F.col("test_doc_id").alias("doc_id")).distinct(), "doc_id", "semi"
    ).select(F.col("doc_id").alias("test_doc_id"), "shingle")
    r_sh = csh.join(
        cand.select(F.col("train_doc_id").alias("doc_id")).distinct(), "doc_id", "semi"
    ).select(F.col("doc_id").alias("train_doc_id"), "shingle")

    inter = (
        cand.join(t_sh, "test_doc_id")
        .join(r_sh, ["train_doc_id", "shingle"])
        .groupBy("test_doc_id", "train_doc_id")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    t_n = t_sh.groupBy("test_doc_id").agg(F.count(F.lit(1)).alias("na"))
    r_n = r_sh.groupBy("train_doc_id").agg(F.count(F.lit(1)).alias("nb"))
    o = F.coalesce(F.col("o"), F.lit(0))
    u = F.col("na") + F.col("nb") - o
    return (
        cand.join(inter, ["test_doc_id", "train_doc_id"], "left")
        .join(t_n, "test_doc_id")
        .join(r_n, "train_doc_id")
        .select(
            "test_doc_id",
            "train_doc_id",
            o.alias("n_inter"),
            u.alias("n_union"),
            (F.lit(JACCARD_DEN) * o >= F.lit(JACCARD_NUM) * u).alias("is_contaminated"),
        )
    )


def _decontaminate_minhash_sql() -> str:
    return f"""
WITH pairs AS ({_minhash_sql()}),
sh AS ({_SHINGLES_SQL}),
bk AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           % {_BUCKETS} AS b
  FROM documents
),
tt AS (
  SELECT CASE WHEN ba.b >= {_VAL} THEN p.doc_a ELSE p.doc_b END AS test_doc_id,
         CASE WHEN ba.b >= {_VAL} THEN p.doc_b ELSE p.doc_a END AS train_doc_id
  FROM pairs p
  JOIN bk ba ON ba.doc_id = p.doc_a
  JOIN bk bb ON bb.doc_id = p.doc_b
  WHERE (ba.b >= {_VAL} AND bb.b < {_TRAIN})
     OR (bb.b >= {_VAL} AND ba.b < {_TRAIN})
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT t.test_doc_id, t.train_doc_id, COUNT(*) AS o
  FROM tt t
  JOIN sh a ON a.doc_id = t.test_doc_id
  JOIN sh c ON c.doc_id = t.train_doc_id AND c.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT t.test_doc_id,
       t.train_doc_id,
       COALESCE(i.o, 0) AS n_inter,
       sa.n + sb.n - COALESCE(i.o, 0) AS n_union,
       {JACCARD_DEN} * COALESCE(i.o, 0)
         >= {JACCARD_NUM} * (sa.n + sb.n - COALESCE(i.o, 0)) AS is_contaminated
FROM tt t
LEFT JOIN inter i ON i.test_doc_id = t.test_doc_id AND i.train_doc_id = t.train_doc_id
JOIN sizes sa ON sa.doc_id = t.test_doc_id
JOIN sizes sb ON sb.doc_id = t.train_doc_id
"""


# r12 window rotation: cross-corpus minhash decontamination promoted to
# the driver window (never hard-gate-checked before)
QUERIES: dict = {"docs_decontaminate_minhash": docs_decontaminate_minhash}
ORACLES: dict = {"docs_decontaminate_minhash": _decontaminate_minhash_sql()}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES: dict = {}
