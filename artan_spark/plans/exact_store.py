"""Persisted exact-hash dedup store + incremental batch append — the EXACT
twin of ``neardup_store``: a daily ingest exact-dedup-checks a new batch
against the WHOLE indexed corpus at batch cost, without re-aggregating the
full corpus and without a streaming query.

Semantics (shared with ``dedup_exact``): two documents are exact duplicates
iff ``md5(text)`` matches; the keeper/owner of a hash group is the SMALLEST
doc_id that ever carried it. A batch doc is a dup iff its hash is already
in the store, or an earlier (smaller-id) doc in the same batch carries it.

Store layout (``index_dir``):
- ``/hashes`` — (text_hash, owner_doc_id) parquet partitioned by
  ``pfx = xxhash64(text_hash) % N_PFX`` — ONE row per distinct hash (the
  store is a set with owners, not a log), so its size tracks distinct
  content, not ingest volume.
- ``/stats``  — 1 row: (n_docs, max_doc_id, n_hashes). ``max_doc_id``
  enforces the id-monotone append contract (same discipline as
  ``append_neardup_index`` / ``append_to_ivf_index``).

Under the id-monotone contract the returned flags equal what
``dedup_exact`` over (indexed corpus + batch) implies for the batch slice,
and appending in one call or split into id-ordered chunks yields identical
flags and identical store contents (chunk-invariance, tested).

100-TB shape:
- batch hashing is a row-wise md5 projection — no shuffle;
- the store read is PARTITION-PRUNED to the <= N_PFX pfx cells the batch
  touches (bounded metadata collect -> IN filter on the partition column),
  so a small batch reads a small corner of an arbitrarily large store;
- within-batch ownership is one hash aggregate on the batch only;
- the append writes ONLY new hashes (left_anti against the pruned slice)
  into only the partitions the batch touches — the store never rewrites
  or compacts existing cells.

The reference engine (ozancicek/artan) has no counterpart; beyond-reference
surface (the SURVEY §2 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_PFX = 64  # hash-prefix partition fan-out


def _hashed(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_hash"),
    ).withColumn("pfx", F.pmod(F.xxhash64("text_hash"), F.lit(N_PFX)))


def _write_stats(spark: SparkSession, index_dir: str, n_docs: int, max_id, n_hashes: int) -> None:
    spark.createDataFrame(
        [(int(n_docs), int(max_id) if max_id is not None else -1, int(n_hashes))],
        "n_docs long, max_doc_id long, n_hashes long",
    ).write.mode("overwrite").parquet(index_dir + "/stats")


def build_exact_index(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the hash store for an initial corpus: one hash aggregate
    (min doc_id per text_hash) partitioned by pfx."""
    h = _hashed(docs, id_col, text_col)
    owners = h.groupBy("pfx", "text_hash").agg(F.min("doc_id").alias("owner_doc_id"))
    owners.write.mode("overwrite").partitionBy("pfx").parquet(index_dir + "/hashes")
    tot = docs.agg(F.count(F.lit(1)).alias("n"), F.max(id_col).alias("m")).first()
    n_hashes = spark.read.parquet(index_dir + "/hashes").count()
    _write_stats(spark, index_dir, tot["n"], tot["m"], n_hashes)


def append_exact_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-dup-flag ``new_docs`` against the store + themselves, then
    append the NEW hashes. Returns (doc_id, is_dup, dup_of) for every batch
    doc. Flags are materialized BEFORE the store write, so the batch never
    shadows itself; an empty batch leaves the store untouched."""
    stats = spark.read.parquet(index_dir + "/stats").first()
    batch = _hashed(new_docs, id_col, text_col).localCheckpoint()
    tot = batch.agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    if tot["n"] == 0:
        return spark.createDataFrame([], "doc_id long, is_dup boolean, dup_of long")
    if tot["lo"] <= stats["max_doc_id"]:
        raise ValueError(
            f"append batch min doc_id {tot['lo']} <= stored max_doc_id "
            f"{stats['max_doc_id']}: appends must be id-monotone (new docs "
            "get new ids) for flags to match the full-corpus computation"
        )

    # partition pruning: bounded metadata collect (<= N_PFX integers)
    pfxs = [r["pfx"] for r in batch.select("pfx").distinct().collect()]
    store = spark.read.parquet(index_dir + "/hashes").filter(F.col("pfx").isin(pfxs))
    ext = store.select("pfx", "text_hash", F.col("owner_doc_id").alias("ext_owner"))

    from pyspark.sql import Window

    batch_owner = F.min("doc_id").over(Window.partitionBy("pfx", "text_hash"))
    own = (
        batch.join(ext, ["pfx", "text_hash"], "left")
        .withColumn("owner", F.least("ext_owner", batch_owner))  # least() skips nulls
    )
    flags = own.select(
        "doc_id",
        (F.col("owner") < F.col("doc_id")).alias("is_dup"),
        F.when(F.col("owner") < F.col("doc_id"), F.col("owner")).alias("dup_of"),
    ).localCheckpoint()  # MATERIALIZE before the append write below

    # append only hashes the store has never seen; within the batch keep
    # the smallest doc_id per new hash (the owner the NEXT append must see)
    new_hashes = (
        batch.join(ext.select("pfx", "text_hash"), ["pfx", "text_hash"], "left_anti")
        .groupBy("pfx", "text_hash")
        .agg(F.min("doc_id").alias("owner_doc_id"))
        .localCheckpoint()
    )
    n_new = new_hashes.count()
    if n_new:
        new_hashes.write.mode("append").partitionBy("pfx").parquet(index_dir + "/hashes")
    _write_stats(
        spark, index_dir, stats["n_docs"] + tot["n"], tot["hi"], stats["n_hashes"] + n_new
    )
    return flags


def exact_index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Store metadata scalars (1-row read)."""
    r = spark.read.parquet(index_dir + "/stats").first()
    return {"n_docs": r["n_docs"], "max_doc_id": r["max_doc_id"], "n_hashes": r["n_hashes"]}


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES: dict = {}
