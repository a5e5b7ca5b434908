"""Persisted exact-hash dedup store: append flags must equal the
full-corpus exact-dedup semantics on the batch slice, appends must be
chunk-invariant in flags AND store contents, and the id-monotone contract
must be enforced — the same acceptance bar as test_neardup_store."""

import hashlib

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.exact_store import (
    append_exact_index,
    build_exact_index,
    exact_index_stats,
)
from artan_spark.sources import read_table_wide

SF_DIR = "/root/testdata/sf0.001"


def _expected_flags(all_docs, batch_ids):
    """Plain-Python replay: doc is a dup iff a smaller-id doc anywhere in
    (indexed + batch) shares its md5(text); dup_of = smallest such id."""
    owner = {}
    for doc_id, text in sorted(all_docs):
        h = hashlib.md5(text.encode()).hexdigest()
        owner.setdefault(h, doc_id)
    out = {}
    for doc_id, text in all_docs:
        if doc_id not in batch_ids:
            continue
        h = hashlib.md5(text.encode()).hexdigest()
        o = owner[h]
        out[doc_id] = (o < doc_id, o if o < doc_id else None)
    return out


@pytest.fixture()
def corpus(spark):
    docs = read_table_wide(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    rows.sort()
    return docs, rows


def test_append_flags_match_full_corpus(spark, corpus, tmp_path):
    docs, rows = corpus
    cut = rows[int(len(rows) * 0.6)][0]
    hi = rows[-1][0]
    base = docs.filter(F.col("doc_id") <= cut)
    # the synthetic corpus has near-dups but NO exact text dups (verified),
    # so inject them: a batch copy of a base doc (store hit) and a
    # within-batch duplicate pair (batch-local ownership)
    injected = [(hi + 1, rows[0][1]), (hi + 2, "inj p q"), (hi + 3, "inj p q")]
    batch = docs.filter(F.col("doc_id") > cut).union(
        spark.createDataFrame(injected, "doc_id long, text string")
    )
    idx = str(tmp_path / "exact_idx")
    build_exact_index(spark, idx, base)
    flags = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in append_exact_index(spark, idx, batch).collect()}
    all_rows = rows + injected
    batch_ids = {d for d, _ in all_rows if d > cut}
    assert flags == _expected_flags(all_rows, batch_ids)
    assert flags[hi + 1] == (True, rows[0][0])
    assert flags[hi + 2] == (False, None)
    assert flags[hi + 3] == (True, hi + 2)


def test_append_chunk_invariance(spark, corpus, tmp_path):
    docs, rows = corpus
    c1 = rows[int(len(rows) * 0.5)][0]
    c2 = rows[int(len(rows) * 0.75)][0]
    base = docs.filter(F.col("doc_id") <= c1)
    batch = docs.filter(F.col("doc_id") > c1)

    one = str(tmp_path / "one")
    build_exact_index(spark, one, base)
    flags_one = {tuple(r) for r in append_exact_index(spark, one, batch).collect()}

    two = str(tmp_path / "two")
    build_exact_index(spark, two, base)
    fa = {tuple(r) for r in append_exact_index(spark, two, docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2))).collect()}
    fb = {tuple(r) for r in append_exact_index(spark, two, docs.filter(F.col("doc_id") > c2)).collect()}
    assert fa | fb == flags_one
    store_one = {tuple(r) for r in spark.read.parquet(one + "/hashes").collect()}
    store_two = {tuple(r) for r in spark.read.parquet(two + "/hashes").collect()}
    assert store_one == store_two
    assert exact_index_stats(spark, one) == exact_index_stats(spark, two)


def test_store_is_set_not_log(spark, tmp_path):
    """Appending duplicates must not grow the hash set."""
    base = spark.createDataFrame([(1, "a b c"), (2, "d e f")], "doc_id long, text string")
    batch = spark.createDataFrame([(3, "a b c"), (4, "a b c")], "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_exact_index(spark, idx, base)
    flags = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in append_exact_index(spark, idx, batch).collect()}
    assert flags == {3: (True, 1), 4: (True, 1)}
    st = exact_index_stats(spark, idx)
    assert st == {"n_docs": 4, "max_doc_id": 4, "n_hashes": 2}


def test_within_batch_dup_and_new_hash_owner(spark, tmp_path):
    """A hash new to the store: earliest batch doc owns it, later batch
    docs dup to it, and the NEXT append sees that owner."""
    base = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_exact_index(spark, idx, base)
    b1 = spark.createDataFrame([(5, "p q r"), (6, "p q r")], "doc_id long, text string")
    flags1 = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in append_exact_index(spark, idx, b1).collect()}
    assert flags1 == {5: (False, None), 6: (True, 5)}
    b2 = spark.createDataFrame([(7, "p q r")], "doc_id long, text string")
    flags2 = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in append_exact_index(spark, idx, b2).collect()}
    assert flags2 == {7: (True, 5)}


def test_id_monotone_enforced_and_empty_batch(spark, tmp_path):
    base = spark.createDataFrame([(10, "a b c")], "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_exact_index(spark, idx, base)
    with pytest.raises(ValueError, match="id-monotone"):
        append_exact_index(
            spark, idx, spark.createDataFrame([(5, "q")], "doc_id long, text string")
        )
    before = exact_index_stats(spark, idx)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert append_exact_index(spark, idx, empty).count() == 0
    assert exact_index_stats(spark, idx) == before
