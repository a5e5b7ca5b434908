"""Misra-Gries heavy-hitters sketch: exactness at full capacity is covered
by the PYTEST_ORACLES harness (test_oracle.py); here the BOUNDED-capacity
regime — where decrements actually fire — must still honor the MG error
certificate and never miss a sufficiently heavy item."""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.sketch import events_heavy_hitters
from artan_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_bounded_capacity_error_certificate(spark):
    # capacity 16 << 150 distinct users -> decrements fire on every partition
    out = events_heavy_hitters(spark, SF_DIR, capacity=16, k=10).collect()
    assert len(out) == 10
    err = out[0].err_bound
    assert err > 0  # the regime under test: summaries actually truncated
    n_rows = 10_000
    # per-partition decrement <= partition_rows/(capacity+1); summed, the
    # global bound can never exceed total_rows/(capacity+1)
    assert err <= n_rows / (16 + 1)

    truth = {
        str(r.user_id): r.c
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in out:
        # MG invariant survives the merge: f - err <= est <= f
        f = truth[r.user_id]
        assert r.est <= f
        assert r.est >= f - err


def test_full_capacity_is_exact_and_certified_zero(spark):
    out = events_heavy_hitters(spark, SF_DIR, capacity=256, k=5).collect()
    assert all(r.err_bound == 0 for r in out)
    truth = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.col("user_id").cast("string").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("user_id"))
        .limit(5)
        .collect()
    )
    assert [(r.user_id, r.est) for r in out] == [(t.user_id, t.c) for t in truth]


def _final_snapshot(rows):
    """Latest (max-seq) emission per key -> {(key, rank): (item, est, err)}."""
    last = {}
    for r in rows:
        last.setdefault(r.stateKey, 0)
        last[r.stateKey] = max(last[r.stateKey], r.seq)
    return {
        (r.stateKey, r.rank): (r.item, r.est, r.err_bound)
        for r in rows
        if r.seq == last[r.stateKey]
    }


def test_streaming_heavy_hitters_batch_equals_stream(spark):
    """At full capacity no decrement fires, so ANY chunking of the stream
    must converge to the same final top-k snapshot as one batch fold."""
    from artan_spark.streaming import StreamingHeavyHitters, stream_transform

    ev = (
        read_table(spark, "/root/testdata/sf0.001", "events")
        .select(F.col("event_type").alias("grp"), F.col("user_id").alias("item"))
    )
    op = (
        StreamingHeavyHitters()
        .setStateKeyCol("grp")
        .setItemCol("item")
        .setCapacity(512)
        .setK(5)
    )
    batch = _final_snapshot(op.transform(ev).collect())
    streamed = _final_snapshot(
        stream_transform(spark, ev, op.transform, chunk_rows=137).collect()
    )
    assert streamed == batch

    # cross-check against exact groupBy truth (err_bound must be 0)
    truth = {
        (r.grp, r.item): r.c
        for r in ev.groupBy("grp", F.col("item").cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for (grp, _rank), (item, est, err) in batch.items():
        assert err == 0
        assert est == truth[(grp, item)]


def test_streaming_heavy_hitters_certificate_under_truncation(spark):
    """capacity far below the distinct-item count: every estimate must
    still satisfy f - err_bound <= est <= f per key."""
    from artan_spark.streaming import StreamingHeavyHitters

    ev = (
        read_table(spark, SF_DIR, "events")
        .select(F.col("event_type").alias("grp"), F.col("user_id").alias("item"))
    )
    op = (
        StreamingHeavyHitters().setStateKeyCol("grp").setItemCol("item").setCapacity(8).setK(5)
    )
    snap = _final_snapshot(op.transform(ev).collect())
    truth = {
        (r.grp, r.item): r.c
        for r in ev.groupBy("grp", F.col("item").cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert any(err > 0 for (_, (_, _, err)) in snap.items())
    for (grp, _rank), (item, est, err) in snap.items():
        f = truth[(grp, item)]
        assert est <= f <= est + err


def test_pack_sequences_invariants(spark):
    """Concat-and-cut packing: per stream, offsets are the exclusive cumsum
    in doc_id order (no gaps, no overlap), seq assignment is offset//len,
    and straddle counts match the spans they claim."""
    from artan_spark.plans.sampling import docs_pack_sequences

    out = docs_pack_sequences(spark, "/root/testdata/sf0.001", seq_len=256).collect()
    by_stream = {}
    for r in out:
        by_stream.setdefault(r.stream, []).append(r)
    assert len(by_stream) > 1
    for rows in by_stream.values():
        rows.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in rows:
            assert r.start_off == expect_off
            assert r.seq_id == r.start_off // 256
            span_end = r.start_off + r.n_tokens - 1
            assert r.n_seqs == span_end // 256 - r.seq_id + 1
            expect_off += r.n_tokens


def test_quantile_sketch_certificate_under_compaction(spark):
    """Bounded-capacity quantile summary: the reported value's true rank is
    within err_bound of the target rank, and the bound is non-trivial
    (< group size). Cum-preserving compaction keeps upper ranks exact, so
    the certificate is Σ_p (max_gap_p - 1)."""
    import bisect
    import math

    from artan_spark.plans.sketch import events_quantile_sketch
    from artan_spark.sources import read_table

    sf = "/root/testdata/sf0.01"
    out = events_quantile_sketch(spark, sf, capacity=8).collect()
    ev = (
        read_table(spark, sf, "events")
        .select("event_type", "value")
        .toPandas()
    )
    assert len(out) == 15  # 5 types x 3 quantiles
    for row in out:
        vals = sorted(ev[ev.event_type == row.event_type].value)
        n = len(vals)
        r = math.ceil(row.q * n)
        lo = bisect.bisect_left(vals, row.est) + 1
        hi = bisect.bisect_right(vals, row.est)
        dist = 0 if lo <= r <= hi else min(abs(r - lo), abs(r - hi))
        assert dist <= row.err_bound, (row, dist)
        assert 0 < row.err_bound < n


def test_streaming_quantiles_batch_equals_stream(spark):
    """At full capacity nothing compacts, so ANY chunking of the stream
    must converge to the same final snapshot as one batch fold — and the
    snapshot is the exact rank-ceil(q*n) element with a zero certificate."""
    import math

    from artan_spark.streaming import StreamingQuantiles, stream_transform

    ev = (
        read_table(spark, "/root/testdata/sf0.001", "events")
        .select(F.col("event_type").alias("grp"), "value")
    )
    op = (
        StreamingQuantiles().setStateKeyCol("grp").setValueCol("value").setCapacity(4096)
    )

    def final(rows):
        last = {}
        for r in rows:
            key = (r.stateKey, r.q)
            if key not in last or r.seq > last[key].seq:
                last[key] = r
        return {k: (v.est, v.n, v.err_bound) for k, v in last.items()}

    batch = final(op.transform(ev).collect())
    streamed = final(stream_transform(spark, ev, op.transform, chunk_rows=137).collect())
    assert streamed == batch

    vals = {}
    for r in ev.collect():
        vals.setdefault(r.grp, []).append(r.value)
    for (grp, q), (est, n, err) in batch.items():
        sv = sorted(vals[grp])
        assert err == 0 and n == len(sv)
        assert est == sv[math.ceil(q * n) - 1]


def test_streaming_quantiles_certificate_under_compaction(spark):
    """capacity far below the per-key row count: the reported value's true
    rank stays within err_bound of the target."""
    import bisect
    import math

    from artan_spark.streaming import StreamingQuantiles

    ev = (
        read_table(spark, SF_DIR, "events")
        .select(F.col("event_type").alias("grp"), "value")
    )
    op = StreamingQuantiles().setStateKeyCol("grp").setValueCol("value").setCapacity(8)
    rows = op.transform(ev).collect()
    last = {}
    for r in rows:
        key = (r.stateKey, r.q)
        if key not in last or r.seq > last[key].seq:
            last[key] = r
    vals = {}
    for r in ev.collect():
        vals.setdefault(r.grp, []).append(r.value)
    assert any(v.err_bound > 0 for v in last.values())
    for (grp, q), v in last.items():
        sv = sorted(vals[grp])
        n = len(sv)
        assert v.n == n
        r_target = math.ceil(q * n)
        lo = bisect.bisect_left(sv, v.est) + 1
        hi = bisect.bisect_right(sv, v.est)
        dist = 0 if lo <= r_target <= hi else min(abs(r_target - lo), abs(r_target - hi))
        assert dist <= v.err_bound, (grp, q, dist, v.err_bound)


def test_sketch_operator_persistence_roundtrip(tmp_path):
    from artan_spark.streaming import StreamingHeavyHitters, StreamingQuantiles

    op1 = StreamingHeavyHitters().setStateKeyCol("grp").setItemCol("u").setCapacity(64).setK(3)
    op1.save(str(tmp_path / "hh"))
    l1 = StreamingHeavyHitters.load(str(tmp_path / "hh"))
    for k in ("stateKeyCol", "itemCol", "capacity", "k"):
        assert l1.get(k) == op1.get(k)

    op2 = (
        StreamingQuantiles()
        .setStateKeyCol("grp")
        .setValueCol("v")
        .setCapacity(128)
        .setQuantiles([0.1, 0.99])
    )
    op2.save(str(tmp_path / "qs"))
    l2 = StreamingQuantiles.load(str(tmp_path / "qs"))
    # JSON persistence lists the tuple; _constants() re-tuples it
    assert tuple(l2.get("quantiles")) == (0.1, 0.99)
    assert l2.get("capacity") == 128


def test_streaming_quantiles_idle_key_state_evicts(spark):
    """Unbounded key spaces need evictable sketch state: with an event-time
    timeout, a key idle past the watermark horizon restarts its summary
    from empty (n resets), while without a timeout the summary keeps
    accumulating across the idle gap."""
    import pandas as pd

    from artan_spark.streaming import StreamingQuantiles, stream_transform

    base = pd.Timestamp("2024-01-01")
    rows = [
        ("a", 0, 1.0),
        ("a", 10, 2.0),
        ("b", 180, 9.0),   # other-key traffic advances the watermark
        ("a", 210, 3.0),   # 3h20 after key a's last row
    ]
    df = spark.createDataFrame(
        [(k, (base + pd.Timedelta(minutes=m)).to_pydatetime(), v) for k, m, v in rows],
        "key string, ts timestamp, value double",
    )

    def run(timeout):
        op = (
            StreamingQuantiles()
            .setStateKeyCol("key")
            .setEventTimeCol("ts")
            .setWatermarkDuration("1 hour")
            .setQuantiles([0.5])
        )
        if timeout:
            op = op.setStateTimeoutMode("event")
        out = stream_transform(spark, df, op.transform, chunk_rows=1).collect()
        # (n, est) emissions per key; seq restarts with the state, so
        # existence checks, not a max-seq snapshot
        return {r.stateKey: set() for r in out} | {
            k: {(r.n, r.est) for r in out if r.stateKey == k}
            for k in {r.stateKey for r in out}
        }

    full = run(False)
    # no timeout: key a's third row folds into the same summary (n=3)
    assert (3, 2.0) in full["a"]

    bounded = run(True)
    # idle 3h20 > 1h horizon: the summary restarted from empty (n=1, est=3.0)
    assert (1, 3.0) in bounded["a"]
    assert not any(n == 3 for n, _ in bounded["a"])


def test_streaming_packer_matches_batch_packer(spark):
    """The streaming packer's incremental offsets reproduce the batch
    pack_sequences assignment row-for-row — in one batch fold AND under
    chunked doc_id-ordered replay (O(1) state per stream either way)."""
    import pandas as pd

    from artan_spark.plans.sampling import SEQ_LEN, docs_pack_sequences
    from artan_spark.streaming import StreamingPacker, stream_transform

    sf = "/root/testdata/sf0.001"
    want = docs_pack_sequences(spark, sf).toPandas()

    # same input shape the batch packer derives: (stream, doc_id, n_tokens)
    from artan_spark.plans.sampling import N_STREAMS, _hash_bucket

    from artan_spark.plans.sampling import n_tokens_expr

    d = (
        read_table(spark, sf, "documents")
        .select(
            (_hash_bucket(F.col("doc_id")) % N_STREAMS).cast("string").alias("stream"),
            "doc_id",
            n_tokens_expr().alias("n_tokens"),
        )
        .orderBy("doc_id")
    )
    op = StreamingPacker().setStateKeyCol("stream").setSeqLen(SEQ_LEN)

    def norm(df):
        p = df.toPandas()
        p["stream"] = p["stream"].astype(int)
        return p[["doc_id", "stream", "n_tokens", "start_off", "seq_id", "n_seqs"]].sort_values(
            "doc_id"
        ).reset_index(drop=True)

    batch = norm(op.transform(d).withColumnRenamed("stateKey", "stream"))
    pd.testing.assert_frame_equal(
        batch, want.sort_values("doc_id").reset_index(drop=True)[batch.columns], check_dtype=False
    )

    streamed = norm(
        stream_transform(spark, d, op.transform, chunk_rows=37).withColumnRenamed(
            "stateKey", "stream"
        )
    )
    pd.testing.assert_frame_equal(streamed, batch, check_dtype=False)


def test_sketch_parameter_validation():
    """Non-positive capacity and out-of-range quantiles fail loudly at set
    time, batch and streaming alike — capacity=0 would otherwise surface
    as a ZeroDivisionError deep inside _compress, and q>1 would silently
    drop the (group, q) row from the output."""
    from artan_spark.plans.sketch import events_quantile_sketch
    from artan_spark.streaming.quantiles import StreamingQuantiles

    with pytest.raises(ValueError, match="capacity"):
        StreamingQuantiles().setCapacity(0)
    with pytest.raises(ValueError, match="capacity"):
        StreamingQuantiles().setCapacity(-5)
    with pytest.raises(ValueError, match="quantiles"):
        StreamingQuantiles().setQuantiles((0.5, 1.5))
    with pytest.raises(ValueError, match="capacity"):
        events_quantile_sketch(None, "", capacity=0)
    with pytest.raises(ValueError, match="quantiles"):
        events_quantile_sketch(None, "", quantiles=(1.5,))


def test_streaming_packer_out_of_order_raises(spark):
    """A micro-batch that regresses behind the packed doc_id frontier must
    fail loudly — silently continuing would shift every later offset away
    from the batch pack_sequences assignment."""
    import pandas as pd

    from artan_spark.streaming import StreamingPacker, stream_transform

    rows = [("s", i, 10) for i in range(40)]
    df = spark.createDataFrame(rows, "stream string, doc_id long, n_tokens long")
    op = StreamingPacker().setStateKeyCol("stream").setSeqLen(64)

    # in-order chunked replay is fine
    ok = stream_transform(spark, df.orderBy("doc_id"), op.transform, chunk_rows=7)
    assert ok.count() == 40

    # descending ingest: the second chunk's min doc_id regresses
    with pytest.raises(Exception, match="out-of-order"):
        stream_transform(
            spark, df.orderBy(F.desc("doc_id")), op.transform, chunk_rows=7
        ).count()


def test_cms_certificate_every_key(spark):
    """Count-Min's one-sided guarantee: est(key) >= true count for EVERY
    key (not just the reported top-n), and est == true when the width is
    large enough that no row has a colliding pair."""
    from artan_spark.plans.sketch import cms_build, cms_estimate

    e = read_table(spark, SF_DIR, "events").select("user_id")
    cells = cms_build(e, "user_id", depth=4, width=256)
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(cells, exact.select("user_id"), "user_id", depth=4, width=256)
    rows = exact.join(est, "user_id").collect()
    assert len(rows) > 100
    assert all(r.cms_estimate >= r.n_exact for r in rows)
    # wide sketch over few keys: every row has a collision-free cell
    wide = cms_estimate(
        cms_build(e, "user_id", depth=4, width=1 << 16),
        exact.select("user_id"),
        "user_id",
        depth=4,
        width=1 << 16,
    )
    wrows = exact.join(wide, "user_id").collect()
    assert all(r.cms_estimate == r.n_exact for r in wrows)


def test_cms_collisions_overcount_pinned(spark):
    """A deliberately tiny sketch (depth 1, width 2) over 3 distinct keys
    MUST over-count whichever keys share a column — pinned exactly: each
    estimate equals the sum of counts in the key's column."""
    from artan_spark.plans.sketch import _cms_col, cms_build, cms_estimate

    rows = [(k,) for k in ("a", "b", "c") for _ in range(5)]
    d = spark.createDataFrame(rows, "k string")
    cells = cms_build(d, "k", depth=1, width=2)
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    est = {r.k: r.cms_estimate for r in cms_estimate(cells, keys, "k", depth=1, width=2).collect()}
    cols = {
        r.k: r.col
        for r in keys.select("k", _cms_col(0, F.col("k"), 2).alias("col")).collect()
    }
    from collections import Counter

    col_tot = Counter()
    for k, c in cols.items():
        col_tot[c] += 5
    for k in ("a", "b", "c"):
        assert est[k] == col_tot[cols[k]], (k, est, cols)


def test_streaming_cms_batch_equals_stream(spark):
    """The streaming CMS grid must converge, under ANY chunking, to the
    exact cell grid one batch build produces (same md5 hash contract),
    so final estimates match the batch sketch estimate-for-estimate and
    keep the one-sided certificate vs exact truth."""
    from artan_spark.plans.sketch import cms_build, cms_estimate
    from artan_spark.streaming import StreamingCountMin, stream_transform

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        F.lit("all").alias("grp"), F.col("user_id").alias("item")
    )
    op = StreamingCountMin().setStateKeyCol("grp").setItemCol("item").setDepth(4).setWidth(64)

    def final_est(rows):
        # latest emission per item wins (seq increments per micro-batch)
        best = {}
        for r in rows:
            if r.item not in best or r.seq > best[r.item][0]:
                best[r.item] = (r.seq, r.est)
        return {i: e for i, (_s, e) in best.items()}

    streamed = final_est(stream_transform(spark, ev, op.transform, chunk_rows=211).collect())

    flat = ev.select(F.col("item").cast("string").alias("k"))
    cells = cms_build(flat, "k", depth=4, width=64)
    keys = flat.distinct()
    batch = {
        r.k: r.cms_estimate
        for r in cms_estimate(cells, keys, "k", depth=4, width=64).collect()
    }
    # BATCH-mode transform folds everything in one step: its emissions are
    # the post-everything estimates and must equal the batch sketch
    # estimate-for-estimate (the md5 hash contract, cell-for-cell)
    one_fold = final_est(op.transform(ev).collect())
    assert one_fold == batch

    # STREAMED emissions are point-in-time ("count so far at this item's
    # last appearance"): every item's occurrences are all folded by its
    # last emission, so est >= exact truth; and cells only grow, so
    # est <= the final batch estimate. Both bounds hold under ANY
    # chunking or data seed (no exact-equality coupling to chunk layout).
    truth = {r.k: r.c for r in flat.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(streamed) == set(batch)
    assert all(truth[k] <= streamed[k] <= batch[k] for k in truth)


def test_kmv_overlap_known_jaccard(spark):
    """Theta-sketch overlap on synthetic sets with KNOWN overlap: types
    X=[0,1000), Y=[500,1500) -> true Jaccard 1/3, union 1500. The K=32
    sketch estimate must land within the sketch's error band; and for
    sets SMALLER than K the sketch degenerates to the exact sets, so the
    estimates are exact."""
    import os
    import tempfile

    from artan_spark.plans.sketch import events_kmv_overlap

    d = tempfile.mkdtemp(prefix="kmvov_")
    rows = [(i, "X", i) for i in range(1000)] + [(i + 10_000, "Y", 500 + i) for i in range(1000)]
    # small disjoint pair: A=[0,10), B=[5,15) -> jaccard 5/15, exact at kk<K
    rows += [(i + 20_000, "a", i) for i in range(10)] + [(i + 30_000, "b", 5 + i) for i in range(10)]
    spark.createDataFrame(rows, "event_id long, event_type string, user_id long").write.parquet(
        os.path.join(d, "events.parquet")
    )
    out = {(r.ta, r.tb): r for r in events_kmv_overlap(spark, d).collect()}

    big = out[("X", "Y")]
    assert 0.1 <= big.jaccard_est <= 0.6, big  # true 1/3, K=32 band
    assert 700 <= big.union_est <= 3000, big  # true 1500

    small = out[("a", "b")]
    # union size 15 < K: sketches ARE the sets -> exact
    assert small.jaccard_est == round(5 / 15, 6)
    assert small.union_est == 15.0 and small.inter_est == round(15 * 5 / 15, 6)
