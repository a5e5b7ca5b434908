"""Streaming restart/recovery: a stateful query stopped mid-stream and
restarted from the SAME checkpoint must resume its state (not restart from
the initial state) and end up row-for-row equal to the batch run."""

import glob
import os
import shutil
import tempfile
import time
import uuid

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_lkf_checkpoint_recovery(spark):
    from artan_spark.operators import LinearKalmanFilter

    rng = np.random.RandomState(0)
    n = 24
    zs = np.cumsum(rng.normal(1.0, 0.5, n))
    rows = [("k", [float(z)]) for z in zs]
    schema = "key string, measurement array<double>"
    df = spark.createDataFrame(rows, schema)

    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[2.0]]))
    )
    batch = {r.stateIndex: r.state.mean[0] for r in flt.transform(df).collect()}

    src = tempfile.mkdtemp(prefix="rec_src_")
    ckpt = tempfile.mkdtemp(prefix="rec_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="rec_out_")
    try:

        def write_chunk(step, chunk):
            tmp = tempfile.mkdtemp()
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))[0]
            dest = os.path.join(src, f"c{step:04d}.parquet")
            shutil.move(part, dest)
            os.utime(dest, (time.time() - 600 + step, time.time() - 600 + step))
            shutil.rmtree(tmp, ignore_errors=True)

        def start_query():
            # memory sink can't recover from a checkpoint; the file sink can
            stream = (
                spark.readStream.schema(spark.createDataFrame(rows, schema).schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = flt.transform(stream).select(
                "stateKey", "stateIndex", F.col("state.mean")[0].alias("mean")
            )
            return (
                out.writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )

        # phase 1: first half
        for i in range(0, n // 2, 4):
            write_chunk(i, rows[i : i + 4])
        q1 = start_query()
        q1.processAllAvailable()
        q1.stop()
        assert spark.read.parquet(out_dir).count() == n // 2

        # phase 2: stop, add the rest, RESTART from the same checkpoint
        for i in range(n // 2, n, 4):
            write_chunk(i, rows[i : i + 4])
        q2 = start_query()
        q2.processAllAvailable()
        q2.stop()
        final = spark.read.parquet(out_dir).collect()

        # the restarted query continues stateIndex where phase 1 stopped
        # (state store survived the restart) and matches the batch run
        idxs = sorted(r.stateIndex for r in final)
        assert idxs == list(range(1, n + 1))
        for r in final:
            np.testing.assert_allclose(r.mean, batch[r.stateIndex], atol=1e-12)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


@pytest.mark.slow
def test_event_time_state_timeout(spark):
    """'event' timeout mode: a key idle for more than the horizon of EVENT
    time (stateTimeoutDuration, falling back to the watermark duration)
    restarts from the initial state on its next row — exact in event time
    regardless of micro-batch layout (StatefulTransformer.scala:49-68
    semantics). A gap under the horizon keeps the state."""
    import datetime as dt

    from artan_spark.operators import LinearKalmanFilter
    from artan_spark.streaming import stream_transform

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    schema = "key string, ts timestamp, measurement array<double>"
    # chunk layout (chunk_rows=1 -> one row per micro-batch):
    #   a@0, a@10 (10m gap < 30m horizon: state kept), b@60 (watermark
    #   advances), a@120 (110m idle > 30m horizon: restarts)
    rows = [
        ("a", ts(0), [1.0]),
        ("a", ts(10), [2.0]),
        ("b", ts(60), [5.0]),
        ("a", ts(120), [3.0]),
    ]
    df = spark.createDataFrame(rows, schema)
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setEventTimeCol("ts")
        .setWatermarkDuration("1 minute")
        .setStateTimeoutMode("event")
        .setStateTimeoutDuration("30 minutes")
        .setProcessNoise(np.array([[1.0]]))
    )
    out = stream_transform(spark, df, flt.transform, chunk_rows=1).collect()
    a_idx = [r.stateIndex for r in sorted((r for r in out if r.stateKey == "a"), key=lambda r: r.eventTime)]
    # without timeout this would be [1, 2, 3]; the horizon reset makes the
    # last row restart at stateIndex 1
    assert a_idx == [1, 2, 1]
    b_idx = [r.stateIndex for r in out if r.stateKey == "b"]
    assert b_idx == [1]


@pytest.mark.slow
def test_rocksdb_state_store_backend(spark):
    """The streaming fold must run unchanged on the RocksDB state store
    provider — the state backend of choice for large deployments (bounded
    JVM heap, spill-to-disk state)."""
    from artan_spark.operators import LinearKalmanFilter
    from artan_spark.streaming import stream_transform

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        zs = np.cumsum(np.random.RandomState(0).normal(1, 0.5, 12))
        df = spark.createDataFrame([("k", [float(z)]) for z in zs], "key string, measurement array<double>")
        flt = (
            LinearKalmanFilter(1, 1)
            .setStateKeyCol("key")
            .setProcessNoise(np.array([[0.5]]))
            .setMeasurementNoise(np.array([[1.0]]))
        )
        batch = flt.transform(df).collect()
        stream = stream_transform(spark, df, flt.transform, chunk_rows=3).collect()
        assert len(stream) == len(batch) == 12
        for rb, rs in zip(
            sorted(batch, key=lambda r: r.stateIndex), sorted(stream, key=lambda r: r.stateIndex)
        ):
            np.testing.assert_allclose(rb.state.mean, rs.state.mean, atol=1e-12)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


@pytest.mark.slow
def test_streaming_cms_checkpoint_recovery(spark):
    """The Count-Min grid must SURVIVE a query restart: phase 2 replays
    the same items as phase 1, so recovered state yields estimates of 6
    per item (3 + 3) while a from-scratch restart would report 3 — at a
    collision-free width the estimate is exact, making the distinction
    sharp."""
    from artan_spark.streaming import StreamingCountMin

    items = [f"it{i:02d}" for i in range(8)]
    phase = [("all", it) for it in items for _ in range(3)]
    schema = "grp string, item string"

    op = StreamingCountMin().setStateKeyCol("grp").setItemCol("item").setWidth(1 << 14)

    src = tempfile.mkdtemp(prefix="cmsrec_src_")
    ckpt = tempfile.mkdtemp(prefix="cmsrec_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="cmsrec_out_")
    try:

        def write_chunk(step, chunk):
            tmp = tempfile.mkdtemp()
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))[0]
            dest = os.path.join(src, f"c{step:04d}.parquet")
            shutil.move(part, dest)
            os.utime(dest, (time.time() - 600 + step, time.time() - 600 + step))
            shutil.rmtree(tmp, ignore_errors=True)

        def start_query():
            stream = (
                spark.readStream.schema(spark.createDataFrame(phase, schema).schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            return (
                op.transform(stream)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )

        write_chunk(0, phase)
        q1 = start_query()
        q1.processAllAvailable()
        q1.stop()
        first = {r.item: r.est for r in spark.read.parquet(out_dir).collect()}
        assert first == {it: 3 for it in items}

        write_chunk(1, phase)
        q2 = start_query()
        q2.processAllAvailable()
        q2.stop()
        rows = spark.read.parquet(out_dir).collect()
        last = max(r.seq for r in rows)
        final = {r.item: r.est for r in rows if r.seq == last}
        # recovered grid: 3 (phase 1, restored from checkpoint) + 3 more
        assert final == {it: 6 for it in items}, final
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
