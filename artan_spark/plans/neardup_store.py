"""Persisted MinHash-LSH signature store + incremental batch append — the
text near-dup twin of ``simsearch.append_to_ivf_index``: a daily ingest can
near-dup-check a new batch against the WHOLE indexed corpus at batch cost,
without recomputing the full-corpus LSH join and without a streaming query.

Store layout (``index_dir``):
- ``/bands``  — (doc_id, sig) parquet partitioned by (band, pfx) where
  ``pfx = xxhash64(sig) % N_PFX``: the partition grid a batch append prunes
  on. One row per (doc, band); sig strings are the shared
  ``streaming/neardup.minhash_bands`` definition, so the store, the batch
  query, the streaming operator, and ``docs_minhash_dedup_flags`` agree
  bit-for-bit.
- ``/stats``  — 1 row: (n_docs, max_doc_id, n_band_rows). ``max_doc_id``
  enforces the append contract.

Append contract (the IVF-append discipline): every appended batch's doc_ids
must EXCEED the stored ``max_doc_id`` (new documents get new ids — the
daily-ingest invariant). Under that contract the returned flags equal
``docs_minhash_dedup_flags`` over (indexed corpus + batch) restricted to
the batch — a doc is a near-dup iff some band bucket holds a smaller
doc_id, whether that owner is already indexed or earlier in the same batch
— and appending in one call or split into id-ordered chunks yields
identical flags and identical store contents (chunk-invariance, tested).

100-TB shape:
- signature compute is the row-wise ``minhash_bands`` projection — no
  explode+groupBy, no shuffle on the batch;
- the store read is PARTITION-PRUNED to the (band, pfx) cells the batch
  actually touches: a bounded collect of the batch's distinct pfx values
  (<= N_PFX integers) becomes an IN filter on the partition column, so a
  small batch reads a small corner of an arbitrarily large store;
- per-bucket existing owners come from one hash aggregate over that pruned
  slice (map-side combine), joined back to the batch-sized band frame;
- the append writes only the partitions the batch touches.

The reference engine (ozancicek/artan) has no counterpart; beyond-reference
surface (the SURVEY §2 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# NOTE: artan_spark.streaming.neardup is imported INSIDE the functions, not
# here — streaming.neardup itself imports plans.dedup, and importing any
# plans submodule runs the plans package __init__, which imports THIS
# module: a top-level import here closes that cycle and breaks worker-side
# deserialization with a partially-initialized-module ImportError (caught
# by test_streaming_cms_batch_equals_stream in the round-10 full-suite run).

N_PFX = 64  # sig-hash partition fan-out within each band


def _with_pfx(bands: DataFrame) -> DataFrame:
    return bands.withColumn("pfx", F.pmod(F.xxhash64("sig"), F.lit(N_PFX)))


def _write_stats(spark: SparkSession, index_dir: str, n_docs: int, max_id, n_rows: int) -> None:
    spark.createDataFrame(
        [(int(n_docs), int(max_id) if max_id is not None else -1, int(n_rows))],
        "n_docs long, max_doc_id long, n_band_rows long",
    ).write.mode("overwrite").parquet(index_dir + "/stats")


def build_neardup_index(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the signature store for an initial corpus. Docs shorter
    than 3 tokens emit no bands (they can never near-dup) but still count
    toward ``max_doc_id`` so the append contract covers them."""
    from artan_spark.streaming.neardup import minhash_bands

    bands = minhash_bands(docs, id_col=id_col, text_col=text_col)
    _with_pfx(bands).write.mode("overwrite").partitionBy("band", "pfx").parquet(
        index_dir + "/bands"
    )
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"), F.max(id_col).alias("m")
    ).first()
    n_rows = spark.read.parquet(index_dir + "/bands").count()
    _write_stats(spark, index_dir, tot["n"], tot["m"], n_rows)


def append_neardup_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup-flag ``new_docs`` against the store + themselves, then
    append their signatures. Returns (doc_id, is_dup, dup_of) for every
    batch doc — equal to the full-corpus ``docs_minhash_dedup_flags`` on
    the batch slice (the append contract above). Flags are materialized
    BEFORE the store write, so the batch never shadows itself."""
    stats = spark.read.parquet(index_dir + "/stats").first()
    batch = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).localCheckpoint()
    tot = batch.agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    if tot["n"] == 0:
        return spark.createDataFrame([], "doc_id long, is_dup boolean, dup_of long")
    if tot["lo"] <= stats["max_doc_id"]:
        raise ValueError(
            f"append batch min doc_id {tot['lo']} <= stored max_doc_id "
            f"{stats['max_doc_id']}: appends must be id-monotone (new docs "
            "get new ids) for flags to match the full-corpus computation"
        )

    from artan_spark.streaming.neardup import minhash_bands

    nb = _with_pfx(minhash_bands(batch)).localCheckpoint()
    # partition pruning: the batch touches a bounded set of pfx cells
    # (<= N_PFX integers — a metadata collect, never corpus-sized)
    pfxs = [r["pfx"] for r in nb.select("pfx").distinct().collect()]
    if pfxs:
        store = spark.read.parquet(index_dir + "/bands").filter(F.col("pfx").isin(pfxs))
        ext = store.groupBy("band", "pfx", "sig").agg(F.min("doc_id").alias("ext_owner"))
        joined = nb.join(ext, ["band", "pfx", "sig"], "left")
    else:  # every batch doc is shingle-less: no bands, no collisions
        joined = nb.withColumn("ext_owner", F.lit(None).cast("long"))

    from pyspark.sql import Window

    batch_owner = F.min("doc_id").over(Window.partitionBy("band", "sig"))
    # least() skips nulls: ext_owner is null for buckets new to the store
    own = joined.withColumn("owner", F.least("ext_owner", batch_owner))
    dup_of = F.min(F.when(F.col("owner") < F.col("doc_id"), F.col("owner")))
    flags = (
        batch.select("doc_id")
        .join(own.groupBy("doc_id").agg(dup_of.alias("dup_of")), "doc_id", "left")
        .select("doc_id", F.col("dup_of").isNotNull().alias("is_dup"), "dup_of")
        .localCheckpoint()  # MATERIALIZE before the append write below
    )

    nb.write.mode("append").partitionBy("band", "pfx").parquet(index_dir + "/bands")
    _write_stats(
        spark,
        index_dir,
        stats["n_docs"] + tot["n"],
        tot["hi"],
        stats["n_band_rows"] + nb.count(),
    )
    return flags


def neardup_index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Store metadata scalars (1-row read): docs indexed, id high-water
    mark, band rows."""
    r = spark.read.parquet(index_dir + "/stats").first()
    return {
        "n_docs": r["n_docs"],
        "max_doc_id": r["max_doc_id"],
        "n_band_rows": r["n_band_rows"],
    }


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES: dict = {}
