"""Second streaming batch: smoother & Poisson-mixture batch==stream,
multi-step predict emission, decayed step size, per-row param columns."""

import numpy as np
import pytest

from artan_spark.operators import (
    LinearKalmanFilter,
    LinearKalmanSmoother,
    PoissonMixture,
)
from artan_spark.streaming import stream_transform


@pytest.mark.slow
def test_smoother_batch_stream_equivalence(spark):
    rng = np.random.RandomState(0)
    n, lag = 18, 4
    zs = np.arange(n) + rng.normal(0, 3, n)
    df = spark.createDataFrame([("k", [float(z)]) for z in zs], "stateKey string, measurement array<double>")
    sm = (
        LinearKalmanSmoother(1, 1)
        .setStateKeyCol("stateKey")
        .setInitialStateCovariance(np.array([[50.0]]))
        .setProcessNoise(np.array([[0.1]]))
        .setMeasurementNoise(np.array([[5.0]]))
        .setFixedLag(lag)
    )
    batch = sm.transform(df).collect()
    stream = stream_transform(spark, df, sm.transform, chunk_rows=5).collect()
    assert len(batch) == len(stream) == (n - lag + 1) * lag
    key = lambda r: (r.stateIndex, r.stepIndex)  # noqa: E731
    for rb, rs in zip(sorted(batch, key=key), sorted(stream, key=key)):
        assert rb.stateIndex == rs.stateIndex and rb.stepIndex == rs.stepIndex
        np.testing.assert_allclose(rb.state.mean, rs.state.mean, atol=1e-12)


@pytest.mark.slow
def test_poisson_mixture_batch_stream_equivalence(spark):
    rng = np.random.RandomState(0)
    samples = np.concatenate([rng.poisson(3.0, 60), rng.poisson(12.0, 60)])
    rng.shuffle(samples)
    df = spark.createDataFrame([(int(s),) for s in samples], "sample long")
    pm = PoissonMixture().setInitialRates([2.0, 10.0]).setMinibatchSize(12).setStepSize(0.2)
    batch = pm.transform(df).collect()
    stream = stream_transform(spark, df, pm.transform, chunk_rows=7).collect()
    assert len(batch) == len(stream) == 10
    for rb, rs in zip(sorted(batch, key=lambda r: r.stateIndex), sorted(stream, key=lambda r: r.stateIndex)):
        np.testing.assert_allclose(
            [d.rate for d in rb.mixtureModel.distributions],
            [d.rate for d in rs.mixtureModel.distributions],
            atol=1e-12,
        )


@pytest.mark.slow
def test_multistep_predict_streaming(spark):
    zs = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([("k", [z]) for z in zs], "key string, measurement array<double>")
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setProcessNoise(np.array([[0.1]]))
        .setMultiStepPredict(2)
    )
    batch = flt.transform(df).collect()
    stream = stream_transform(spark, df, flt.transform, chunk_rows=2).collect()
    assert len(batch) == len(stream) == len(zs) * 3
    key = lambda r: (r.stateIndex, r.stepIndex)  # noqa: E731
    for rb, rs in zip(sorted(batch, key=key), sorted(stream, key=key)):
        np.testing.assert_allclose(rb.state.mean, rs.state.mean, atol=1e-12)


def _sq_fn(m, H):
    lin = H @ m
    return lin * np.abs(lin) ** 0.5


@pytest.mark.slow
def test_ekf_batch_stream_equivalence(spark):
    """Nonlinear measurement fn + cloudpickled callables through the
    applyInPandasWithState path."""
    from artan_spark.operators import ExtendedKalmanFilter

    rng = np.random.RandomState(0)
    zs = np.abs(np.cumsum(rng.normal(1, 0.5, 20)))
    df = spark.createDataFrame([("k", [float(z)]) for z in zs], "key string, measurement array<double>")
    ekf = (
        ExtendedKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setInitialStateMean(np.array([1.0]))
        .setInitialStateCovariance(np.array([[10.0]]))
        .setProcessNoise(np.array([[0.5]]))
        .setMeasurementNoise(np.array([[1.0]]))
        .setMeasurementFunction(_sq_fn)
    )
    batch = ekf.transform(df).collect()
    stream = stream_transform(spark, df, ekf.transform, chunk_rows=4).collect()
    assert len(batch) == len(stream) == 20
    for rb, rs in zip(sorted(batch, key=lambda r: r.stateIndex), sorted(stream, key=lambda r: r.stateIndex)):
        np.testing.assert_allclose(rb.state.mean, rs.state.mean, atol=1e-12)


def test_decayed_step_size(spark):
    """decayRate: alpha_k = (2+k)^-rate (MixtureBase.scala:393-396)."""
    rng = np.random.RandomState(0)
    samples = rng.poisson(5.0, 200)
    df = spark.createDataFrame([(int(s),) for s in samples], "sample long")
    pm = PoissonMixture().setInitialRates([2.0, 9.0]).setMinibatchSize(20).setDecayRate(0.6)
    rows = pm.transform(df).orderBy("stateIndex").collect()
    assert len(rows) == 10
    rates = [sorted(d.rate for d in r.mixtureModel.distributions) for r in rows]
    # moves from the init toward 5.0 and the movement shrinks with k
    assert abs(rates[-1][0] - 5.0) < abs(rates[0][0] - 5.0)


def test_per_row_minibatch_and_step_size(spark):
    """Column params override constants (KalmanBase.scala:505-525 pattern)."""
    rng = np.random.RandomState(0)
    samples = rng.poisson(4.0, 90)
    rows = [(int(s), 30, 0.5) for s in samples]
    df = spark.createDataFrame(rows, "sample long, mb int, ss double")
    pm = (
        PoissonMixture()
        .setInitialRates([2.0, 9.0])
        .setMinibatchSize(5)  # overridden by the column
        .setMinibatchSizeCol("mb")
        .setStepSizeCol("ss")
    )
    out = pm.transform(df)
    assert out.count() == 3  # 90 samples / per-row minibatch 30


def test_per_row_initial_state_cols(spark):
    """initialStateMeanCol/initialStateCovarianceCol seed each key's filter
    (KalmanBase.scala:54-88)."""
    from artan_spark.types import np_to_mat

    rows = [
        ("a", [0.0], [5.0], np_to_mat(np.array([[1e-6]]))),
        ("b", [0.0], [-3.0], np_to_mat(np.array([[1e-6]]))),
    ]
    df = spark.createDataFrame(
        rows,
        "key string, measurement array<double>, m0 array<double>, "
        "p0 struct<numRows:int,numCols:int,values:array<double>>",
    )
    flt = (
        LinearKalmanFilter(1, 1)
        .setStateKeyCol("key")
        .setInitialStateMeanCol("m0")
        .setInitialStateCovarianceCol("p0")
        .setProcessNoise(np.array([[0.0]]))
        .setMeasurementNoise(np.array([[1000.0]]))  # ~ignore the measurement
    )
    out = {r.stateKey: r.state.mean[0] for r in flt.transform(df).collect()}
    assert abs(out["a"] - 5.0) < 0.1 and abs(out["b"] + 3.0) < 0.1


@pytest.mark.slow
@pytest.mark.parametrize("cls_name", ["UnscentedKalmanFilter", "CubatureKalmanFilter"])
def test_sigma_point_batch_stream_equivalence(spark, cls_name):
    """Closes the batch==stream matrix: sigma-point family through
    applyInPandasWithState (incl. sigma-point state round-trip)."""
    import artan_spark.operators as ops

    cls = getattr(ops, cls_name)
    rng = np.random.RandomState(0)
    zs = np.cumsum(rng.normal(0.5, 1.0, 16))
    df = spark.createDataFrame([("k", [float(z)]) for z in zs], "key string, measurement array<double>")
    flt = (
        cls(1, 1)
        .setStateKeyCol("key")
        .setInitialStateCovariance(np.array([[10.0]]))
        .setProcessNoise(np.array([[0.5]]))
        .setMeasurementNoise(np.array([[1.0]]))
    )
    batch = flt.transform(df).collect()
    stream = stream_transform(spark, df, flt.transform, chunk_rows=5).collect()
    assert len(batch) == len(stream) == 16
    for rb, rs in zip(sorted(batch, key=lambda r: r.stateIndex), sorted(stream, key=lambda r: r.stateIndex)):
        np.testing.assert_allclose(rb.state.mean, rs.state.mean, atol=1e-12)
        np.testing.assert_allclose(
            rb.state.covariance.values, rs.state.covariance.values, atol=1e-12
        )


def test_streaming_media_probe_and_decode(spark):
    """probe_media / decode_media / sample_video_frames are STATELESS
    mapInPandas transforms, so they run unchanged on a stream: the
    streamed replay equals the batch output row-for-row — the live-ingest
    shape of a media lake (classify + decode on arrival, no state)."""
    import numpy as np

    from artan_spark.plans.mediaprobe import probe_media
    from artan_spark.plans.multimodal import (
        decode_media,
        encode_png,
        encode_y4m,
        sample_video_frames,
        sniff_media_type,
    )
    from artan_spark.streaming import stream_transform
    from pyspark.sql import functions as F

    rng = np.random.RandomState(3)
    rows = []
    for i in range(6):
        if i % 2:
            blob = encode_png(rng.randint(0, 256, (8, 9)).astype(np.uint8))
        else:
            blob = encode_y4m([rng.randint(0, 256, (6, 8)).astype(np.uint8)] * 3)
        rows.append((i, bytearray(blob)))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    typed = lambda df: df.withColumn("media_type", sniff_media_type(F.col("payload")))  # noqa: E731

    for name, xf in (
        ("probe", lambda df: probe_media(df)),
        ("decode", lambda df: decode_media(typed(df))),
        ("frames", lambda df: sample_video_frames(typed(df), every=2)),
    ):
        batch = {tuple(r) for r in xf(media).collect()}
        streamed = {tuple(r) for r in stream_transform(spark, media, xf, chunk_rows=2).collect()}
        assert streamed == batch, name


def test_streaming_weighted_reservoir_equals_batch_sample(spark):
    """The A-ES priority is a pure function of the item, so the streaming
    reservoir's final snapshot must equal the batch
    ``docs_weighted_sample`` query row-for-row (same items, same order)
    under any chunking — and an interleaved replay with different chunk
    sizes converges to the same snapshot."""
    from pyspark.sql import functions as F

    from artan_spark.plans.sampling import K_WEIGHTED, docs_weighted_sample
    from artan_spark.sources import read_table
    from artan_spark.streaming import StreamingWeightedReservoir, stream_transform

    SF = "/root/testdata/sf0.001"
    batch = [
        (r.doc_id, r.n_chars)
        for r in docs_weighted_sample(spark, SF).collect()
    ]

    docs = read_table(spark, SF, "documents").select(
        F.lit("all").alias("grp"),
        F.col("doc_id").cast("string").alias("item"),
        F.col("n_chars").cast("double").alias("weight"),
    )
    op = (
        StreamingWeightedReservoir()
        .setStateKeyCol("grp")
        .setItemCol("item")
        .setWeightCol("weight")
        .setK(K_WEIGHTED)
    )

    def final_snapshot(rows):
        last = max(r.seq for r in rows)
        return [
            (int(r.item), int(r.weight))
            for r in sorted((r for r in rows if r.seq == last), key=lambda r: r.rank)
        ]

    for chunk in (97, 211):
        streamed = final_snapshot(
            stream_transform(spark, docs, op.transform, chunk_rows=chunk).collect()
        )
        assert streamed == batch, (chunk, streamed[:3], batch[:3])

    # one-fold batch-mode call agrees too
    assert final_snapshot(op.transform(docs).collect()) == batch


def test_streaming_funnel_equals_batch(spark):
    """The streaming funnel's final per-user completions must equal the
    batch query's conditioned-min semantics on an event-time-ordered
    replay — including the strict-order rejections (click before view
    does not count)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from artan_spark.streaming import StreamingFunnel, stream_transform

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1 completes all three in order
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        # u2: click before view -> stalls at view
        (2, ts(0), "click"), (2, ts(1), "view"), (2, ts(2), "purchase"),
        # u3: purchase before click -> stalls at click
        (3, ts(0), "view"), (3, ts(1), "purchase"), (3, ts(2), "click"),
        # u4 never views
        (4, ts(0), "click"),
        # u5: retry path — click rejected, re-click after view counts
        (5, ts(0), "click"), (5, ts(1), "view"), (5, ts(2), "click"), (5, ts(3), "purchase"),
    ]
    df = spark.createDataFrame(
        [(str(u), t, e) for u, t, e in rows], "user string, ts timestamp, event_type string"
    ).orderBy("ts", "user")
    op = (
        StreamingFunnel()
        .setStateKeyCol("user")
        .setEventTimeCol("ts")
        .setTypeCol("event_type")
    )
    expected = {
        ("1", 1): "view", ("1", 2): "click", ("1", 3): "purchase",
        ("2", 1): "view",
        ("3", 1): "view", ("3", 2): "click",
        ("5", 1): "view", ("5", 2): "click", ("5", 3): "purchase",
    }

    batch = {(r.stateKey, r.step): r.step_name for r in op.transform(df).collect()}
    assert batch == expected, batch
    streamed = {
        (r.stateKey, r.step): r.step_name
        for r in stream_transform(spark, df, op.transform, chunk_rows=3).collect()
    }
    assert streamed == expected, streamed
