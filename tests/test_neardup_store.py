"""Persisted MinHash signature store: append-flags equal the full-corpus
docs_minhash_dedup_flags on the appended slice, chunk-invariant, id-monotone
contract enforced, store reads partition-pruned."""

import pytest
import pyspark.sql.functions as F

from artan_spark.plans.dedup import docs_minhash_dedup_flags
from artan_spark.plans.neardup_store import (
    append_neardup_index,
    build_neardup_index,
    neardup_index_stats,
)
from artan_spark.sources import read_table

from conftest import SF_DIR


def _docs(spark):
    return read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _split_by_id(spark, frac=0.5):
    d = _docs(spark)
    ids = sorted(r.doc_id for r in d.select("doc_id").collect())
    cut = ids[int(len(ids) * frac)]
    return d.filter(F.col("doc_id") < cut), d.filter(F.col("doc_id") >= cut), cut


def test_append_flags_match_full_corpus(spark, tmp_path):
    base, batch, _cut = _split_by_id(spark)
    idx = str(tmp_path / "nd")
    build_neardup_index(spark, idx, base)

    got = {r.doc_id: r for r in append_neardup_index(spark, idx, batch).collect()}
    full = {r.doc_id: r for r in docs_minhash_dedup_flags(spark, SF_DIR).collect()}
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert set(got) == batch_ids
    for i in batch_ids:
        assert (got[i].is_dup, got[i].dup_of) == (full[i].is_dup, full[i].dup_of), i
    # and the corpus has real near-dups to make the check non-vacuous
    assert any(full[i].is_dup for i in full)

    st = neardup_index_stats(spark, idx)
    assert st["n_docs"] == _docs(spark).count()
    assert st["max_doc_id"] == max(batch_ids)


def test_append_chunk_invariance(spark, tmp_path):
    base, batch, _cut = _split_by_id(spark)
    ids = sorted(r.doc_id for r in batch.select("doc_id").collect())
    mid = ids[len(ids) // 2]

    one = str(tmp_path / "one")
    build_neardup_index(spark, one, base)
    whole = {r.doc_id: r for r in append_neardup_index(spark, one, batch).collect()}

    two = str(tmp_path / "two")
    build_neardup_index(spark, two, base)
    f1 = append_neardup_index(spark, two, batch.filter(F.col("doc_id") < mid))
    f2 = append_neardup_index(spark, two, batch.filter(F.col("doc_id") >= mid))
    split = {r.doc_id: r for r in f1.unionByName(f2).collect()}

    assert set(whole) == set(split)
    for i in whole:
        assert (whole[i].is_dup, whole[i].dup_of) == (split[i].is_dup, split[i].dup_of)
    # identical store contents either way
    a = spark.read.parquet(one + "/bands")
    b = spark.read.parquet(two + "/bands")
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert neardup_index_stats(spark, one) == neardup_index_stats(spark, two)


def test_within_batch_duplicates_flagged(spark, tmp_path):
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    idx = str(tmp_path / "wb")
    build_neardup_index(spark, idx, base)
    batch = spark.createDataFrame(
        [
            (10, "one two three four five six seven"),
            (11, "one two three four five six seven"),  # dup of 10, same batch
            (12, "alpha beta gamma delta epsilon zeta"),  # dup of stored 0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in append_neardup_index(spark, idx, batch).collect()}
    assert (got[10].is_dup, got[10].dup_of) == (False, None)
    assert (got[11].is_dup, got[11].dup_of) == (True, 10)
    assert (got[12].is_dup, got[12].dup_of) == (True, 0)


def test_monotone_contract_and_empty_batch(spark, tmp_path):
    base = spark.createDataFrame(
        [(5, "a b c d e f"), (6, "g h i j k l")], "doc_id long, text string"
    )
    idx = str(tmp_path / "mono")
    build_neardup_index(spark, idx, base)
    rows0 = spark.read.parquet(idx + "/bands").count()

    stale = spark.createDataFrame([(5, "x y z w v u")], "doc_id long, text string")
    with pytest.raises(ValueError, match="id-monotone"):
        append_neardup_index(spark, idx, stale)

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = append_neardup_index(spark, idx, empty)
    assert out.count() == 0
    # neither failure path touched the store
    assert spark.read.parquet(idx + "/bands").count() == rows0
    assert neardup_index_stats(spark, idx)["max_doc_id"] == 6

    # shingle-less docs append cleanly: no bands, never dups, id recorded
    short = spark.createDataFrame([(9, "hi")], "doc_id long, text string")
    got = {r.doc_id: r for r in append_neardup_index(spark, idx, short).collect()}
    assert (got[9].is_dup, got[9].dup_of) == (False, None)
    assert neardup_index_stats(spark, idx)["max_doc_id"] == 9


def test_store_read_is_partition_pruned(spark, tmp_path):
    """A 1-doc append must read only the (band, pfx) cells its signatures
    hash to — not the whole store (the batch-cost-not-corpus-cost claim)."""
    base, batch, _cut = _split_by_id(spark)
    idx = str(tmp_path / "prune")
    build_neardup_index(spark, idx, base)
    n_dirs = (
        spark.read.parquet(idx + "/bands").select("band", "pfx").distinct().count()
    )

    one = batch.orderBy("doc_id").limit(1)
    from artan_spark.plans.neardup_store import N_PFX, _with_pfx
    from artan_spark.streaming.neardup import minhash_bands

    touched = _with_pfx(minhash_bands(one)).select("pfx").distinct().count()
    # the pruned read lists at most n_bands * touched-pfx cells
    pruned = spark.read.parquet(idx + "/bands").filter(
        F.col("pfx").isin(
            [r.pfx for r in _with_pfx(minhash_bands(one)).select("pfx").distinct().collect()]
        )
    )
    read_dirs = pruned.select("band", "pfx").distinct().count()
    assert touched <= N_PFX
    assert read_dirs < n_dirs  # strictly fewer cells than the full store
    # and the plan pushes the partition filter down to the file source
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "pfx" in plan.split("PartitionFilters")[1][:200]


def test_three_neardup_implementations_agree(spark, tmp_path):
    """The batch window formulation (docs_minhash_dedup_flags), the
    streaming operator (streaming_near_dup, full-history mode), and the
    persisted-store append path must produce IDENTICAL flags for the same
    corpus — three independent implementations of one contract.

    The store is driven as a daily ingest (three id-ordered batches from
    an empty build); streaming/batch run over the whole corpus at once.
    Docs with <3 tokens emit no bands: the batch/streaming sides omit
    them, the store reports them not-dup — both mean 'cannot near-dup'."""
    from artan_spark.plans.dedup import docs_minhash_dedup_flags
    from artan_spark.streaming.neardup import streaming_near_dup

    d = _docs(spark)
    batch = {r.doc_id: r for r in docs_minhash_dedup_flags(spark, SF_DIR).collect()}
    stream = {r.doc_id: r for r in streaming_near_dup(d).collect()}

    idx = str(tmp_path / "tri")
    ids = sorted(r.doc_id for r in d.select("doc_id").collect())
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    build_neardup_index(spark, idx, d.filter(F.col("doc_id") < cuts[0]))
    f1 = append_neardup_index(
        spark, idx, d.filter((F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1]))
    )
    f2 = append_neardup_index(spark, idx, d.filter(F.col("doc_id") >= cuts[1]))
    store = {r.doc_id: r for r in f1.unionByName(f2).collect()}

    # streaming emits one row per doc WITH bands; batch window likewise
    assert set(stream) == set(batch)
    for i in batch:
        assert (stream[i].is_dup, stream[i].dup_of) == (batch[i].is_dup, batch[i].dup_of), i
    # the store covers the appended two-thirds; agree on that slice
    for i in store:
        if i in batch:
            assert (store[i].is_dup, store[i].dup_of) == (batch[i].is_dup, batch[i].dup_of), i
        else:  # shingle-less doc: store says not-dup, others omit the row
            assert (store[i].is_dup, store[i].dup_of) == (False, None), i
