"""Training export: shards are lossless and duplicate-free, the written
per-shard row order is the md5 training order, re-exports bit-reproduce,
and the assignment plan is a pure projection (zero exchanges)."""

from pyspark.sql import functions as F

from artan_spark.plans.export import (
    N_EXPORT_SHARDS,
    export_plan,
    read_training_shard,
    shard_assignments,
    write_training_shards,
)
from artan_spark.sources import read_table_wide

from conftest import SF_DIR


def _docs(spark):
    return read_table_wide(spark, SF_DIR, "documents").select("doc_id", "text")


def test_shards_lossless_and_ordered(spark, tmp_path):
    d = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(d, out)
    total = 0
    seen = set()
    for s in range(N_EXPORT_SHARDS):
        rows = read_training_shard(spark, out, s).collect()
        total += len(rows)
        ids = [r.doc_id for r in rows]
        assert not (set(ids) & seen)
        seen.update(ids)
        # the file's row order IS the training order (okey ascending)
        okeys = [r.okey for r in rows]
        assert okeys == sorted(okeys), f"shard {s} not in training order"
        assert len(rows) > 0, f"shard {s} empty"
    src_ids = {r.doc_id for r in d.select("doc_id").collect()}
    assert seen == src_ids and total == len(src_ids)


def test_reexport_bit_reproduces(spark, tmp_path):
    d = _docs(spark)
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(d, a_dir)
    write_training_shards(d, b_dir)
    for s in range(N_EXPORT_SHARDS):
        a = [tuple(r) for r in read_training_shard(spark, a_dir, s).collect()]
        b = [tuple(r) for r in read_training_shard(spark, b_dir, s).collect()]
        assert a == b


def test_plan_matches_assignments_and_is_projection(spark):
    d = _docs(spark)
    plan = {r.shard: r for r in export_plan(d).collect()}
    counts = {
        r.shard: r.c
        for r in shard_assignments(d).groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {s: r.n_docs for s, r in plan.items()} == counts
    assert sum(counts.values()) == d.count()
    # the assignment itself shuffles nothing (checked on the raw scan —
    # read_table_wide's opt-in scan widening adds its own round-robin)
    from artan_spark.sources import read_table

    raw = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    p = shard_assignments(raw)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
