"""transformWithState (PySpark >=4.0) streaming backend: the same fold on
the arbitrary-state API must reproduce the batch result row-for-row, like
the default applyInPandasWithState backend does."""

from __future__ import annotations

import numpy as np
import pytest

from artan_spark.operators import LinearKalmanFilter, RecursiveLeastSquaresFilter
from artan_spark.streaming import stream_transform


def _tws_available() -> bool:
    """pyspark's transformWithState streaming runner needs protobuf; when
    it is not pip-installed, artan_spark.compat.ensure_protobuf() probes
    for a vendored pure-Python copy (conftest.py runs it before the JVM
    starts so the Spark workers inherit the PYTHONPATH shim)."""
    from artan_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


needs_tws = pytest.mark.skipif(
    not _tws_available(), reason="protobuf unavailable: transformWithState runner cannot start"
)


@pytest.fixture()
def rocksdb(spark):
    # transformWithState requires the RocksDB state store provider
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    yield spark
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _lkf_df(spark):
    rng = np.random.RandomState(3)
    rows = [
        (f"k{i % 4}", [float(rng.normal(10.0 * (i % 4), 1.0))])
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "stateKey string, measurement array<double>")


@needs_tws
def test_lkf_tws_backend_equals_batch(rocksdb):
    spark = rocksdb
    df = _lkf_df(spark)
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("stateKey")
        .setInitialStateCovariance(np.array([[100.0]]))
        .setProcessNoise(np.array([[1.0]]))
        .setMeasurementNoise(np.array([[10.0]]))
        # the bit-exact batch==stream contract is the SEQUENTIAL fold's
        # (auto would run the scan in batch, ~1e-15 off the recursion)
        .setFoldEngine("sequential")
    )
    batch = flt.transform(df).collect()
    tws = flt.copy().setStreamingBackend("transformWithState")
    stream = stream_transform(spark, df, tws.transform, chunk_rows=3).collect()
    assert len(stream) == len(batch)
    key = lambda r: (r.stateKey, r.stateIndex)  # noqa: E731
    for rb, rs in zip(sorted(batch, key=key), sorted(stream, key=key)):
        assert (rb.stateKey, rb.stateIndex) == (rs.stateKey, rs.stateIndex)
        np.testing.assert_array_equal(np.array(rb.state.mean), np.array(rs.state.mean))
        np.testing.assert_array_equal(
            np.array(rb.state.covariance.values), np.array(rs.state.covariance.values)
        )


@needs_tws
def test_rls_tws_backend_equals_default_backend(rocksdb):
    spark = rocksdb
    rng = np.random.RandomState(5)
    rows = [
        (f"g{i % 3}", float(1.5 + 0.5 * i + rng.normal(0, 0.1)), [float(i), 1.0])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "stateKey string, label double, features array<double>")
    rls = RecursiveLeastSquaresFilter(2).setStateKeyCol("stateKey")
    default = stream_transform(spark, df, rls.transform, chunk_rows=4).collect()
    tws = rls.copy().setStreamingBackend("transformWithState")
    got = stream_transform(spark, df, tws.transform, chunk_rows=4).collect()
    key = lambda r: (r.stateKey, r.stateIndex)  # noqa: E731
    assert len(got) == len(default)
    for ra, rb in zip(sorted(default, key=key), sorted(got, key=key)):
        assert (ra.stateKey, ra.stateIndex) == (rb.stateKey, rb.stateIndex)
        np.testing.assert_array_equal(np.array(ra.state.mean), np.array(rb.state.mean))


def test_tws_backend_clear_error_without_protobuf(spark):
    """Without protobuf the backend must fail fast with a clear ImportError
    at transform() time, not an opaque JVM query crash at start()."""
    if _tws_available():
        pytest.skip("protobuf present; the runtime path is covered by the B==S tests")
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("stateKey")
        .setStreamingBackend("transformWithState")
    )
    df = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS stateKey", "array(CAST(value AS DOUBLE)) AS measurement"
    )
    with pytest.raises(ImportError, match="protobuf"):
        flt.transform(df)


def _rate_stream(spark):
    return spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS stateKey",
        "timestamp AS ts",
        "array(CAST(value AS DOUBLE)) AS measurement",
    )


def test_tws_backend_validates_timeout_config(spark):
    """Timeout-config errors surface BEFORE the protobuf probe, so a
    misconfigured pipeline fails identically with or without the runner
    dependency installed: process mode needs a duration; event mode needs
    a duration or a watermark as the idleness horizon."""
    df = _rate_stream(spark)
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("stateKey")
        .setStreamingBackend("transformWithState")
        .setStateTimeoutMode("process")
    )
    with pytest.raises(ValueError, match="stateTimeoutDuration"):
        flt.transform(df)
    flt2 = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("stateKey")
        .setStreamingBackend("transformWithState")
        .setStateTimeoutMode("event")
    )
    with pytest.raises(ValueError, match="horizon"):
        flt2.transform(df)


@needs_tws
def test_tws_backend_event_timeout_restarts_state(rocksdb):
    """The same timeout-restart contract the default backend pins
    (tests/test_streaming2.py): a key idle past the event-time horizon
    restarts from the initial state — stateIndex resets to 1 — via the
    TWS access-time gap check + engine timer."""
    import pandas as pd

    spark = rocksdb
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = (
        [("a", (t0 + pd.Timedelta(seconds=i)).to_pydatetime(), [float(i)]) for i in range(3)]
        # 10-minute silence >> 1-minute horizon: state must restart
        + [("a", (t0 + pd.Timedelta(minutes=10 + i)).to_pydatetime(), [float(i)]) for i in range(3)]
    )
    df = spark.createDataFrame(
        rows, "stateKey string, ts timestamp, measurement array<double>"
    )
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("stateKey")
        .setEventTimeCol("ts")
        .setWatermarkDuration("5 seconds")
        .setStateTimeoutMode("event")
        .setStateTimeoutDuration("1 minute")
        .setStreamingBackend("transformWithState")
    )
    got = stream_transform(spark, df, flt.transform, chunk_rows=1).collect()
    idx = sorted(r.stateIndex for r in got)
    # two independent runs of 3 rows each: stateIndex 1,2,3 twice
    assert idx == [1, 1, 2, 2, 3, 3]
