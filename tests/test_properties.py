"""Property-based kernel invariants (hypothesis): things that must hold for
ANY input, not just the seeded fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from artan_spark import linalg

_dim = st.integers(min_value=1, max_value=4)
_finite = st.floats(min_value=-50, max_value=50, allow_nan=False, allow_infinity=False)


def _rand_spd(rng, n, scale=1.0):
    a = rng.normal(0, 1, (n, n))
    return a @ a.T + scale * np.eye(n)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10_000), _dim)
def test_kf_cycle_preserves_spd_and_symmetry(seed, n):
    rng = np.random.RandomState(seed)
    m = rng.normal(0, 5, n)
    P = _rand_spd(rng, n)
    F = rng.normal(0, 1, (n, n))
    Q = _rand_spd(rng, n, 0.1)
    H = rng.normal(0, 1, (1, n))
    R = np.array([[abs(rng.normal()) + 0.1]])
    z = rng.normal(0, 5, 1)

    m1, P1 = linalg.kf_predict(m, P, F, Q)
    np.testing.assert_allclose(P1, P1.T)
    m2, P2, r, S = linalg.kf_estimate(m1, P1, z, H, R)
    np.testing.assert_allclose(P2, P2.T, atol=1e-9)
    # Joseph form keeps covariance PSD and the update contracts it
    eig = np.linalg.eigvalsh(P2)
    assert eig.min() > -1e-9
    assert np.trace(P2) <= np.trace(P1) + 1e-9
    assert S[0, 0] > 0


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(10, 60))
def test_rls_matches_lstsq_for_random_problems(seed, n_samples):
    rng = np.random.RandomState(seed)
    feats = np.column_stack([rng.normal(0, 1, n_samples), np.ones(n_samples)])
    y = feats @ np.array([1.5, -2.0]) + rng.normal(0, 0.1, n_samples)
    m = np.zeros(2)
    P = 1e8 * np.eye(2)
    for i in range(n_samples):
        m, P, _ = linalg.rls_update(m, P, y[i], feats[i], 1.0)
    np.testing.assert_allclose(m, linalg.ols(feats, y), atol=1e-4)


@settings(max_examples=50, deadline=None)
@given(st.lists(_finite, min_size=1, max_size=20))
def test_logsumexp_matches_naive_when_safe(xs):
    a = np.array(xs)
    naive = np.log(np.sum(np.exp(a)))
    # atol floor: for subnormal inputs the stable form is MORE accurate than
    # the naive one (hypothesis-found), so exact rtol can't hold
    np.testing.assert_allclose(linalg.logsumexp(a), naive, rtol=1e-10, atol=1e-12)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), _dim)
def test_sigma_point_sets_reproduce_moments(seed, n):
    rng = np.random.RandomState(seed)
    m = rng.normal(0, 3, n)
    P = _rand_spd(rng, n)
    for pts, wm, wc in (
        linalg.merwe_sigma_points(m, P, 0.5, 2.0, 0.1),
        linalg.julier_sigma_points(m, P, 1.0),
        linalg.cubature_points(m, P),
    ):
        mean, cov = linalg.unscented_transform(pts, wm, wc, np.zeros((n, n)))
        np.testing.assert_allclose(mean, m, atol=1e-8)
        np.testing.assert_allclose(cov, P, atol=1e-7)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10_000), _dim)
def test_mvn_logpdf_integrates_consistently(seed, n):
    # pdf at the mean must dominate pdf anywhere else for identity-like covs
    rng = np.random.RandomState(seed)
    mean = rng.normal(0, 2, n)
    cov = _rand_spd(rng, n)
    x = mean + rng.normal(0, 1, n)
    assert linalg.mvn_logpdf(mean, mean, cov) >= linalg.mvn_logpdf(x, mean, cov)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_poisson_logpmf_normalizes(seed):
    rng = np.random.RandomState(seed)
    rate = abs(rng.normal(0, 5)) + 0.1
    ks = np.arange(0, 200)
    total = np.exp(linalg.poisson_logpmf(ks, rate)).sum()
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 200), st.sampled_from([8, 16]))
def test_wav_roundtrip_any_signal(seed, n, bits):
    """encode_wav_pcm -> _wav_features is exact for any PCM signal: frame
    count preserved, mean |amplitude| matches the closed form."""
    from artan_spark.plans.multimodal import _wav_features, encode_wav_pcm

    rng = np.random.default_rng(seed)
    if bits == 8:
        s = rng.integers(0, 256, n).astype(np.uint8)
        expected = np.abs(s.astype(np.float64) - 128.0).mean()
    else:
        s = rng.integers(-(2**15), 2**15, n).astype(np.int16)
        expected = np.abs(s.astype(np.float64)).mean()
    w, h, frames, mean_abs = _wav_features(0, encode_wav_pcm(s, bits=bits))
    assert (w, h, frames) == (None, None, n)
    assert mean_abs == round(float(expected), 6)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 24), st.integers(1, 24))
def test_bmp_roundtrip_any_geometry(seed, w, h):
    """encode_bmp -> _bmp_features is exact across geometries, including
    widths whose 3-byte rows need 4-byte padding."""
    from artan_spark.plans.multimodal import _bmp_features, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    gw, gh, n, mean_i = _bmp_features(0, encode_bmp(px))
    assert (gw, gh, n) == (w, h, w * h)
    assert mean_i == round(float(px.astype(np.float64).mean()), 6)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 8),
    st.integers(1, 10),
    st.integers(1, 10),
    st.sampled_from(["C420jpeg", "C444", "Cmono"]),
)
def test_y4m_roundtrip_any_stream(seed, n_frames, w2, h2, colorspace):
    """encode_y4m -> _y4m_features recovers geometry and the sampled-frame
    luma mean for every colorspace branch (even dims: 4:2:0 requires them)."""
    from artan_spark.plans.multimodal import _y4m_features, encode_y4m

    w, h = 2 * w2, 2 * h2
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n_frames)]
    gw, gh, n, mean_i = _y4m_features(0, encode_y4m(frames, colorspace=colorspace))
    sampled = frames[::2]
    assert (gw, gh, n) == (w, h, len(sampled))
    assert mean_i == round(float(np.stack(sampled).astype(np.float64).mean()), 6)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 24), st.integers(1, 24), st.booleans())
def test_pnm_roundtrip_any_raster(seed, w, h, ppm):
    from artan_spark.plans.multimodal import _pnm_features, encode_pnm

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if ppm else (h, w)
    px = rng.integers(0, 256, shape).astype(np.uint8)
    gw, gh, n, mean_i = _pnm_features(0, encode_pnm(px, ppm=ppm))
    assert (gw, gh, n) == (w, h, w * h)
    expected = px.astype(np.float64).mean(axis=2).mean() if ppm else px.astype(np.float64).mean()
    assert mean_i == round(float(expected), 6)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_sniffer_identifies_every_encoder_output(seed):
    """detect_media_type assigns the right type to every built-in encoder's
    bytes — the encode/sniff/decode triangle closes for any payload."""
    from artan_spark.plans.multimodal import (
        detect_media_type,
        encode_bmp,
        encode_pnm,
        encode_wav_pcm,
        encode_y4m,
    )

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    assert detect_media_type(encode_wav_pcm(rng.integers(-100, 100, 7).astype(np.int16))) == "audio/wav"
    assert detect_media_type(encode_bmp(gray)) == "image/bmp"
    assert detect_media_type(encode_pnm(gray)) == "image/x-portable-graymap"
    assert detect_media_type(encode_y4m([gray])) == "video/x-yuv4mpeg"


@given(st.integers(0, 2**32 - 1), st.integers(1, 400), st.integers(2, 32))
@settings(max_examples=40, deadline=None)
def test_quantile_compress_preserves_upper_ranks(seed, n, capacity):
    """Cum-preserving compaction invariants: total weight preserved, at most
    ~capacity points kept, and every kept point's cumulative weight equals
    its ORIGINAL cumulative weight (exact upper rank survives compaction —
    the property the rank-error certificate rests on)."""
    from artan_spark.streaming.quantiles import _compress

    rng = np.random.RandomState(seed)
    vals = rng.normal(0, 10, n)
    wts = rng.randint(1, 5, n).astype(np.int64)

    order = np.argsort(vals, kind="mergesort")
    sv, sw = vals[order], wts[order]
    orig_cum_by_value = dict(zip(sv, np.cumsum(sw)))

    cv, cw = _compress(vals, wts, capacity)
    assert cw.sum() == wts.sum()
    assert len(cv) <= capacity + 1
    assert np.all(np.diff(cv) >= 0)
    cum = np.cumsum(cw)
    for v, c in zip(cv, cum):
        assert orig_cum_by_value[v] == c
    # the last point is the maximum (q=1.0 stays exact)
    assert cv[-1] == sv[-1]


# -- round-10 text operators: pure-Python cores under arbitrary input --------

_word = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Zs", "Cc", "Cs")),
    min_size=1,
    max_size=12,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_word, st.integers(1, 50)), min_size=1, max_size=12))
def test_wordpiece_trainer_total_and_encode_cover(counts):
    """For ANY corpus: the trained piece set contains the full alphabet
    (both forms), so greedy encode never UNKs an in-corpus word; encoding
    reconstructs the word exactly."""
    from artan_spark.plans.wordpiece import (
        UNK,
        encode_word,
        train_wordpiece_from_counts,
    )

    # dedupe words (the trainer contract: counts come from a hash-agg)
    seen: dict = {}
    for w, c in counts:
        seen[w] = seen.get(w, 0) + c
    counts = sorted(seen.items())
    pieces = set(train_wordpiece_from_counts(counts, n_merges=5))
    for w, _c in counts:
        if len(w) > 100:
            continue
        toks = encode_word(w, pieces)
        assert UNK not in toks, (w, toks)
        rebuilt = toks[0] + "".join(t[2:] for t in toks[1:])
        assert rebuilt == w


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_word, min_size=0, max_size=40),
    st.integers(2, 16),
    st.integers(1, 16),
)
def test_chunking_reference_reconstruction(tokens, window, stride):
    """Plain-Python replica of chunk_documents' start/slice arithmetic:
    every token appears in at least one chunk, stride-prefixes rebuild the
    stream, and chunk count is ceil-like in len/stride."""
    import math

    stride = min(stride, window)  # stride > window would drop tokens
    n = len(tokens)
    n_chunks = max(math.floor((n - 1) / stride), 0) + 1
    chunks = [tokens[k * stride : k * stride + window] for k in range(n_chunks)]
    assert len(chunks) == n_chunks
    covered = []
    for c in chunks:
        covered.extend(c[:stride])
    assert covered[:n] == tokens  # reconstruction, tail never dropped
    if n:
        assert chunks[-1]  # last chunk non-empty when doc has tokens
        assert (n_chunks - 1) * stride < n  # no start past the end
