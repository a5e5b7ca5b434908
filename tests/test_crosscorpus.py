"""Cross-corpus MinHash similarity join + near-dup decontamination:
consistency with the self-join dedup family and a plain-Python exact
Jaccard replay of the evidence columns. (Oracle parity at sf0.001 is in
test_oracle.py via PYTEST_ORACLES; plan lint sweeps it too.)"""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.crosscorpus import (
    crosscorpus_neardup,
    docs_decontaminate_minhash,
    minhash_similarity_join,
)
from artan_spark.sources import read_table_wide

SF_DIR = "/root/testdata/sf0.001"


def _py_shingles(text: str) -> set:
    t = text.strip().split()
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_similarity_join_matches_selfjoin_cross_pairs(spark):
    """Splitting the corpus in two and similarity-joining the halves must
    recover exactly the cross-half subset of dedup_minhash_lsh's pairs —
    the two operators share one candidate criterion."""
    from artan_spark.plans.dedup import dedup_minhash_lsh

    docs = read_table_wide(spark, SF_DIR, "documents")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    cross = {
        (r["left_id"], r["right_id"])
        for r in minhash_similarity_join(odd, even).collect()
    }
    self_pairs = dedup_minhash_lsh(spark, SF_DIR).collect()
    expected = {
        (a, b) if a % 2 == 1 else (b, a)
        for a, b in ((r["doc_a"], r["doc_b"]) for r in self_pairs)
        if (a % 2) != (b % 2)
    }
    assert cross == expected
    assert cross  # non-vacuous on this corpus


def test_broadcast_right_same_result(spark):
    docs = read_table_wide(spark, SF_DIR, "documents")
    probe = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    a = set(map(tuple, minhash_similarity_join(probe, corpus).collect()))
    b = set(map(tuple, minhash_similarity_join(probe, corpus, broadcast_right=True).collect()))
    assert a == b


def test_decontaminate_evidence_replays_exact_jaccard(spark):
    """Every (test, train) candidate's n_inter/n_union must equal the
    plain-Python word-3-gram set computation, and is_contaminated must be
    the exact-rational 2*inter >= union test."""
    rows = docs_decontaminate_minhash(spark, SF_DIR).collect()
    assert rows  # the synthetic corpus has cross-split near-dups
    texts = {
        r["doc_id"]: r["text"]
        for r in read_table_wide(spark, SF_DIR, "documents").collect()
    }
    seen_flagged = 0
    for r in rows:
        a = _py_shingles(texts[r["test_doc_id"]])
        b = _py_shingles(texts[r["train_doc_id"]])
        inter, union = len(a & b), len(a | b)
        assert r["n_inter"] == inter, r
        assert r["n_union"] == union, r
        assert r["is_contaminated"] == (2 * inter >= union), r
        seen_flagged += bool(r["is_contaminated"])
    assert seen_flagged  # real leakage exists in the corpus — non-vacuous


def test_crosscorpus_neardup_disjoint_texts_no_flags(spark):
    """Two corpora with no shared content: candidates (if any hash
    coincidences occur) must all fail verification."""
    probe = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(2, "one two three four five six seven")], "doc_id long, text string"
    )
    rows = crosscorpus_neardup(probe, corpus).collect()
    assert all(not r["is_contaminated"] for r in rows)


def test_crosscorpus_neardup_identical_text_flagged(spark):
    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = crosscorpus_neardup(probe, corpus).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["probe_id"], r["corpus_id"]) == (1, 9)
    assert r["n_inter"] == r["n_union"]
    assert r["is_contaminated"]
