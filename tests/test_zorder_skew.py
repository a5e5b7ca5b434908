"""Z-order layout + skew diagnostics: the z-tile grid delivers BOTH-column
locality (the pruning argument a linear sort cannot make), the clustered
write carries tile-narrow ranges per file, and skew_report's suggested
salt levels a planted heavy key."""

from pyspark.sql import functions as F

from artan_spark.plans.skew import skew_report
from artan_spark.plans.zorder import (
    Q_BITS,
    TILE_BITS,
    cluster_by_zorder,
    events_zorder_layout,
    zorder_keys,
)
from artan_spark.sources import read_table

from conftest import SF_DIR


def test_ztiles_are_narrow_in_both_dimensions(spark):
    ev = read_table(spark, SF_DIR, "events")
    g = ev.agg(
        F.min("user_id").alias("mnu"), F.max("user_id").alias("mxu"),
        F.min("value").alias("mnv"), F.max("value").alias("mxv"),
    ).first()
    span_u, span_v = g.mxu - g.mnu, g.mxv - g.mnv
    tiles = events_zorder_layout(spark, SF_DIR).collect()
    assert sum(r.n_rows for r in tiles) == ev.count()
    n_side = 1 << TILE_BITS
    # each tile spans <= 1/8 of each dimension (+1 quantization cell slop)
    slop_u = span_u / (1 << Q_BITS) + 1
    slop_v = span_v / (1 << Q_BITS)
    for r in tiles:
        assert r.max_user - r.min_user <= span_u / n_side + slop_u, r
        assert r.max_value - r.min_value <= span_v / n_side + slop_v, r
    # a single-column sort CANNOT make this claim for the second column:
    # bucketing by user_id alone leaves value ranges at ~full span
    by_user = (
        ev.withColumn("b", F.ntile(n_side * n_side).over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("user_id")
        ))
        .groupBy("b")
        .agg((F.max("value") - F.min("value")).alias("vspan"))
        .agg(F.max("vspan"))
        .first()[0]
    )
    assert by_user > span_v / n_side + slop_v


def test_clustered_write_has_tile_narrow_files(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events").select("user_id", "value")
    out = str(tmp_path / "z")
    cluster_by_zorder(ev, "user_id", "value", out)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # per-file (= per-tile dir) ranges match the layout manifest's tiles
    spans = (
        back.groupBy("zbucket")
        .agg((F.max("user_id") - F.min("user_id")).alias("uspan"))
        .collect()
    )
    g = ev.agg((F.max("user_id") - F.min("user_id")).alias("s")).first().s
    n_side = 1 << TILE_BITS
    for r in spans:
        assert r.uspan <= g / n_side + g / (1 << Q_BITS) + 1


def test_zorder_keys_partitioning_invariant(spark):
    ev = read_table(spark, SF_DIR, "events").select("user_id", "value", "event_type")
    a = sorted(tuple(r) for r in zorder_keys(ev, "user_id", "value").collect())
    b = sorted(tuple(r) for r in zorder_keys(ev.repartition(7), "user_id", "value").collect())
    assert a == b


def test_zorder_constant_dimension_is_guarded(spark):
    """A constant column has mx == mn: without the degenerate-range guard
    the quantizer divides 0/0 (NaN zkeys). All rows must land in cell 0
    of that dimension — finite keys, and the varying dimension still
    spreads across buckets."""
    df = spark.createDataFrame(
        [(7, float(i)) for i in range(256)], "k long, v double"
    )
    z = zorder_keys(df, "k", "v").collect()
    assert all(r.zkey is not None and r.zkey >= 0 for r in z)
    # constant x-dimension contributes 0 bits -> zkey is pure y-interleave
    assert len({r.zbucket for r in z}) > 1
    both_const = zorder_keys(
        spark.createDataFrame([(1, 2.0)] * 5, "k long, v double"), "k", "v"
    ).collect()
    assert {(r.zkey, r.zbucket) for r in both_const} == {(0, 0)}


def test_skew_report_suggests_salts_for_planted_skew(spark):
    # 900 rows on one key, 10 x 10 elsewhere: max_share = 0.9
    rows = [(0, i) for i in range(900)] + [(k, i) for k in range(1, 11) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, x long")
    r = skew_report(df, "k", shuffle_partitions=32).first()
    assert r.n_rows == 1000 and r.n_keys == 11
    assert r.top_key == 0 and r.max_rows == 900
    assert abs(r.max_share - 0.9) < 1e-9
    assert r.suggested_salts == 29  # ceil(0.9 * 32)
    # uniform data with keys >> partitions suggests no salting
    u = spark.createDataFrame([(k, i) for k in range(64) for i in range(2)], "k long, x long")
    assert skew_report(u, "k").first().suggested_salts == 1
