"""Baseline JPEG codec (plans/jpeg.py): round-trip accuracy across
quality/sampling/geometry, entropy-coding edge cases, the multimodal
pipeline integration, and actionable errors for unsupported variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from artan_spark.plans.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_rgb,
    jpeg_gray,
)


def _smooth(h, w, seed=3, noise=3.0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 80 * np.sin(xx / 15.0) * np.cos(yy / 11.0) + rng.normal(0, noise, (h, w))
    return img.clip(0, 255).astype(np.uint8)


def test_gray_roundtrip_accuracy():
    img = _smooth(37, 53)  # non-multiples of 8: edge-replication padding path
    payload = encode_jpeg_gray(img, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    back = jpeg_gray(payload)
    assert back.shape == (37, 53)
    err = np.abs(back - img.astype(np.float64))
    assert err.mean() < 3.0 and err.max() < 25.0


def test_color_roundtrip_444_and_420():
    img = _smooth(37, 53)
    rgb = np.stack([img, np.roll(img, 3, 1), 255 - img], axis=2).astype(np.uint8)
    want = rgb.astype(np.float64).mean(axis=2)
    p444 = encode_jpeg_rgb(rgb, quality=90, subsample=False)
    p420 = encode_jpeg_rgb(rgb, quality=90, subsample=True)
    for payload in (p444, p420):
        back = jpeg_gray(payload)
        assert back.shape == (37, 53)
        assert np.abs(back - want).mean() < 3.0
    # 4:2:0 carries quarter-res chroma: smaller file, SOF sampling byte 0x22
    assert len(p420) < len(p444)
    planes, h, w = decode_jpeg(p420)
    assert len(planes) == 3 and (h, w) == (37, 53)
    assert all(p.shape == (37, 53) for p in planes)  # chroma upsampled back


def test_quality_tradeoff_monotone():
    img = _smooth(40, 56)
    sizes, errs = [], []
    for q in (95, 60, 15):
        payload = encode_jpeg_gray(img, quality=q)
        sizes.append(len(payload))
        errs.append(float(np.abs(jpeg_gray(payload) - img).mean()))
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < errs[1] < errs[2]


def test_entropy_edge_cases():
    # flat image: every AC coefficient 0 -> pure DC/EOB stream
    flat = np.full((16, 16), 77, dtype=np.uint8)
    assert np.abs(jpeg_gray(encode_jpeg_gray(flat, quality=90)) - 77).max() < 2.0
    # extreme checkerboard: maximal high-frequency energy, ZRL paths
    cb = np.indices((24, 24)).sum(axis=0) % 2 * 255
    back = jpeg_gray(encode_jpeg_gray(cb.astype(np.uint8), quality=95))
    assert back.shape == (24, 24)
    # the pattern survives recognizably: correlation with the original
    a, b = cb.ravel() - cb.mean(), back.ravel() - back.mean()
    corr = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.9
    # 1x1 image: single padded block
    one = np.array([[200]], dtype=np.uint8)
    assert jpeg_gray(encode_jpeg_gray(one)).shape == (1, 1)


def test_unsupported_variants_raise():
    img = _smooth(16, 16)
    payload = bytearray(encode_jpeg_gray(img))
    idx = payload.find(b"\xff\xc0")
    # flipping SOF0 -> SOF2 makes the baseline full-band scan ILLEGAL as
    # progressive (a progressive DC scan must have Se == 0): the now-real
    # progressive decoder rejects it as corrupt instead of NotImplemented
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se != 0"):
        jpeg_gray(bytes(payload))
    payload[idx + 1] = 0xC9  # arithmetic coding family
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jpeg_gray(bytes(payload))
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_gray(b"BMnope")
    with pytest.raises(ValueError, match="no SOS"):
        jpeg_gray(b"\xff\xd8\xff\xd9")


def test_jpeg_through_spark_pipeline(spark):
    """image/jpeg decodes through sniff -> decode_media like every other
    real codec, and the perceptual dHash is close enough to the lossless
    codecs for the banded near-dup join to pair them."""
    from pyspark.sql import functions as F

    from artan_spark.plans.multimodal import (
        _bmp_gray,
        decode_media,
        encode_bmp,
        image_dhash,
        image_near_dup_pairs,
        sniff_media_type,
    )

    img = _smooth(32, 32)
    payload = encode_jpeg_gray(img, quality=95)
    media = spark.createDataFrame(
        [(31, bytearray(payload))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        sniff_media_type(F.col("payload")).alias("media_type"),
        "payload",
        F.length("payload").alias("payload_len"),
    )
    row = decode_media(media).collect()[0]
    assert row.media_type == "image/jpeg"
    assert (row.width, row.height, row.n_units) == (32, 32, 1024)
    assert abs(row.mean_intensity - float(img.astype(np.float64).mean())) < 2.0

    # lossy but perceptually stable: dHash within the banded-join radius
    h_jpeg = image_dhash(jpeg_gray(payload))
    h_bmp = image_dhash(_bmp_gray(encode_bmp(img)))
    assert bin(h_jpeg ^ h_bmp).count("1") <= 6

    other = _smooth(32, 32, seed=11, noise=40.0)
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(img))),
        (2, "image/jpeg", bytearray(payload)),
        (3, "image/bmp", bytearray(encode_bmp(other))),
    ]
    pairs_df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    pairs = {(r.doc_a, r.doc_b) for r in image_near_dup_pairs(pairs_df).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_restart_marker_decode():
    """A stream with DRI/RSTn markers decodes correctly (DC predictors
    reset per interval) — hand-spliced since the encoder doesn't emit
    restarts: re-encode each 8-row MCU stripe independently and join the
    entropy segments with RSTn."""
    img = _smooth(24, 16)
    # encode stripes separately: each has its own DC start at 0, which is
    # exactly the predictor-reset semantics of a restart interval of 2 MCUs
    # (16px wide -> 2 MCUs per stripe row)
    full = encode_jpeg_gray(img, quality=90)
    stripes = [img[r : r + 8] for r in range(0, 24, 8)]
    segs = []
    for s in stripes:
        p = encode_jpeg_gray(s, quality=90)
        sos = p.find(b"\xff\xda")
        (ln,) = struct.unpack(">H", p[sos + 2 : sos + 4])
        segs.append(p[sos + 2 + ln : -2])  # entropy bytes, EOI stripped
    # headers from the full image (correct H), DRI = 2 MCUs
    sos = full.find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 2)
    (ln,) = struct.unpack(">H", full[sos + 2 : sos + 4])
    head = full[:sos] + dri + full[sos : sos + 2 + ln]
    body = b""
    for i, seg in enumerate(segs):
        body += seg
        if i < len(segs) - 1:
            body += bytes([0xFF, 0xD0 + (i % 8)])
    spliced = head + body + b"\xff\xd9"
    back = jpeg_gray(spliced)
    assert back.shape == (24, 16)
    assert np.abs(back - img.astype(np.float64)).mean() < 3.0


def test_property_roundtrip_fuzz():
    """Property sweep: random shapes/contents/qualities round-trip within
    baseline-JPEG error bounds for gray, 4:4:4, and 4:2:0 — and the
    decoder never accepts a payload it can't parse (truncations raise
    cleanly instead of hanging or returning garbage shapes)."""
    rng = np.random.RandomState(17)
    for trial in range(12):
        h = int(rng.randint(1, 70))
        w = int(rng.randint(1, 70))
        q = int(rng.choice([25, 60, 90]))
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        back = jpeg_gray(encode_jpeg_gray(img, quality=q))
        assert back.shape == (h, w)
        assert np.all(back >= 0.0) and np.all(back <= 255.0)
        if h >= 8 and w >= 8 and q >= 60:
            # random noise is the worst case for DCT coding; the block
            # means still survive quantization
            assert abs(float(back.mean()) - float(img.mean())) < 16.0
        rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in (False, True):
            back = jpeg_gray(encode_jpeg_rgb(rgb, quality=q, subsample=sub))
            assert back.shape == (h, w)

    # truncation fuzz: every prefix family either raises or is ignored
    payload = encode_jpeg_gray(rng.randint(0, 256, (24, 24)).astype(np.uint8))
    for cut in (2, 4, 20, len(payload) // 2, len(payload) - 3):
        try:
            out = jpeg_gray(payload[:cut])
            # tolerated only if the scan header was complete: shape intact
            assert out.shape == (24, 24)
        except (ValueError, NotImplementedError):
            pass  # clean parser rejection (never a bare struct/index error)


def test_bitreader_zero_pads_past_end():
    """A truncated entropy stream pads with zero bits (T.81 behavior) —
    the decode finishes with a valid-shape raster instead of hanging."""
    img = _smooth(16, 16)
    payload = bytearray(encode_jpeg_gray(img, quality=90))
    # chop the final 4 entropy bytes (before EOI)
    chopped = bytes(payload[:-6]) + b"\xff\xd9"
    out = jpeg_gray(chopped)
    assert out.shape == (16, 16)


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------


def _textured(h, w, seed=5):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 128 + 70 * np.sin(xx / 6.0) * np.cos(yy / 4.0) + rng.normal(0, 12, (h, w))
    return img.clip(0, 255).astype(np.uint8)


def test_progressive_gray_matches_baseline_bit_for_bit():
    """Progressive and baseline encoders quantize identically, so the
    progressive decode must reproduce the baseline decode EXACTLY —
    across sizes that exercise padding, multi-block EOB runs, ZRLs,
    and every scan kind in the script (DC/AC first + refinement)."""
    from artan_spark.plans.jpeg import encode_jpeg_progressive

    for shape in [(16, 16), (37, 53), (1, 1), (8, 8), (9, 130)]:
        img = _textured(*shape)
        base = jpeg_gray(encode_jpeg_gray(img, quality=85))
        payload = encode_jpeg_progressive(img, quality=85)
        planes, h, w = decode_jpeg(payload)
        assert (h, w) == shape
        np.testing.assert_array_equal(planes[0], base, err_msg=str(shape))


def test_progressive_color_444_420_and_restarts():
    """Color scripts route chroma through their own tables and
    non-interleaved AC scans; 4:2:0 adds the subsampled block grids;
    restart intervals reset DC predictors and EOB runs mid-scan."""
    from artan_spark.plans.jpeg import encode_jpeg_progressive

    img = _textured(37, 29)
    rgb = np.stack([img, np.roll(img, 5, 1), 255 - img], axis=2).astype(np.uint8)
    for sub in (False, True):
        base = jpeg_gray(encode_jpeg_rgb(rgb, quality=80, subsample=sub))
        for ri in (0, 3):
            prog = jpeg_gray(
                encode_jpeg_progressive(rgb, quality=80, subsample=sub, restart_interval=ri)
            )
            np.testing.assert_array_equal(prog, base, err_msg=f"sub={sub} ri={ri}")


def test_progressive_eob_runs_exercised():
    """A low-energy image must produce EOBn symbols with n >= 1 (runs of
    >1 all-zero bands) — the decoder path fixed-length counters miss."""
    from artan_spark.plans import jpeg as J

    img = np.full((48, 64), 90, dtype=np.uint8)
    img[5:9, 7:11] = 200  # one feature so not every block is empty
    seen = []
    orig_symbol = J._FreqSink.symbol

    def spy(self, key, s):
        if key[0] == 1 and (s & 0xF) == 0 and (s >> 4) not in (0, 15):
            seen.append(s >> 4)
        orig_symbol(self, key, s)

    J._FreqSink.symbol = spy
    try:
        payload = J.encode_jpeg_progressive(img, quality=90)
    finally:
        J._FreqSink.symbol = orig_symbol
    assert seen, "no EOBn (n>=1) symbols were emitted"
    np.testing.assert_array_equal(
        jpeg_gray(payload), jpeg_gray(encode_jpeg_gray(img, quality=90))
    )


def test_progressive_truncation_and_corruption_fuzz():
    """Every prefix and every single-bit corruption either decodes to
    SOME array or raises ValueError/NotImplementedError — never an
    uncontrolled exception (junk tolerance contract)."""
    from artan_spark.plans.jpeg import encode_jpeg_progressive

    img = _textured(24, 24)
    payload = encode_jpeg_progressive(img, quality=80)
    for cut in range(2, len(payload), 61):
        try:
            jpeg_gray(payload[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = np.random.RandomState(1)
    for _ in range(400):
        b = bytearray(payload)
        b[rng.randint(2, len(b))] ^= 1 << rng.randint(8)
        try:
            jpeg_gray(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_progressive_through_spark_pipeline(spark):
    """A progressive JPEG flows through sniff -> decode_media and lands
    on the same dHash as its baseline encoding (identical pixels)."""
    from pyspark.sql import functions as F

    from artan_spark.plans.jpeg import encode_jpeg_progressive
    from artan_spark.plans.multimodal import (
        decode_media,
        image_dhash,
        image_near_dup_pairs,
        sniff_media_type,
    )

    img = _textured(32, 32)
    rows = [
        (1, bytearray(encode_jpeg_gray(img, quality=90))),
        (2, bytearray(encode_jpeg_progressive(img, quality=90))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "media_type", sniff_media_type(F.col("payload"))
    )
    feats = {r.doc_id: r for r in decode_media(media).collect()}
    assert feats[1].media_type == feats[2].media_type == "image/jpeg"
    assert feats[1].mean_intensity == feats[2].mean_intensity
    pairs = image_near_dup_pairs(media).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def _random_scan_script(rng, ncomp, max_al=2):
    """Random VALID progressive scan script: one interleaved DC
    successive-approximation chain plus, per component, a random
    contiguous band split of 1..63 where each band gets its own Al chain
    (first scan at Al, refinements Ah=a+1/Al=a down to 0). Chains are
    randomly interleaved (intra-chain order preserved; the DC first scan
    leads, per T.81)."""
    chains = []
    dc_al = int(rng.randint(0, max_al + 1))
    chains.append(
        [("all", 0, 0, 0, dc_al)]
        + [("all", 0, 0, a + 1, a) for a in range(dc_al - 1, -1, -1)]
    )
    for c in range(ncomp):
        ncuts = int(rng.randint(0, 3))
        cuts = (
            sorted(rng.choice(np.arange(2, 63), size=ncuts, replace=False).tolist())
            if ncuts
            else []
        )
        edges = [1] + [int(x) for x in cuts] + [64]
        for i in range(len(edges) - 1):
            lo, hi = edges[i], edges[i + 1] - 1
            al = int(rng.randint(0, max_al + 1))
            chains.append(
                [(c, lo, hi, 0, al)]
                + [(c, lo, hi, a + 1, a) for a in range(al - 1, -1, -1)]
            )
    script = [chains[0][0]]
    idx = [1] + [0] * (len(chains) - 1)
    remaining = sum(len(ch) for ch in chains) - 1
    while remaining:
        j = int(rng.randint(0, len(chains)))
        if idx[j] < len(chains[j]):
            script.append(chains[j][idx[j]])
            idx[j] += 1
            remaining -= 1
    return script


def test_progressive_random_scan_script_fuzz():
    """Round-8 fuzz lane: randomized COMPLETE scan scripts (random band
    splits, Al chains, interleavings) must all decode bit-for-bit equal
    to the baseline decode — gray and color, 4:4:4 and 4:2:0, with and
    without restarts."""
    from artan_spark.plans.jpeg import encode_jpeg_progressive

    img = _textured(21, 34)
    base_g = jpeg_gray(encode_jpeg_gray(img, quality=80))
    for seed in range(8):
        rng = np.random.RandomState(seed)
        script = _random_scan_script(rng, 1)
        ri = int(rng.randint(0, 4))
        got = jpeg_gray(
            encode_jpeg_progressive(img, quality=80, restart_interval=ri, scans=script)
        )
        np.testing.assert_array_equal(got, base_g, err_msg=f"gray seed={seed} ri={ri}")

    rgb = np.stack([img, np.roll(img, 3, 1), 255 - img], axis=2).astype(np.uint8)
    for seed in range(8, 12):
        rng = np.random.RandomState(seed)
        sub = bool(seed % 2)
        base_c = jpeg_gray(encode_jpeg_rgb(rgb, quality=80, subsample=sub))
        got = jpeg_gray(
            encode_jpeg_progressive(
                rgb, quality=80, subsample=sub, scans=_random_scan_script(rng, 3)
            )
        )
        np.testing.assert_array_equal(got, base_c, err_msg=f"color seed={seed} sub={sub}")


def test_progressive_incomplete_and_duplicate_scans():
    """Scan-script EDGE cases: a script missing its final refinements is
    a legal (lossy) stream — decode must SUCCEED with the right shape;
    duplicated scans must decode or raise ValueError, never anything
    uncontrolled."""
    from artan_spark.plans.jpeg import encode_jpeg_progressive

    img = _textured(24, 19)
    for seed in range(6):
        rng = np.random.RandomState(100 + seed)
        script = _random_scan_script(rng, 1)

        # missing refinement: drop every Al=0 refinement pass (keep scans
        # that FIRST-code at Al=0 — ah == 0 entries)
        incomplete = [s for s in script if not (s[3] != 0 and s[4] == 0)]
        if len(incomplete) < len(script):
            planes, h, w = decode_jpeg(
                encode_jpeg_progressive(img, quality=80, scans=incomplete)
            )
            assert (h, w) == img.shape and planes[0].shape == img.shape

        # duplicate scans: re-emit one random scan immediately again
        j = int(rng.randint(0, len(script)))
        dup = script[: j + 1] + [script[j]] + script[j + 1 :]
        try:
            planes, h, w = decode_jpeg(encode_jpeg_progressive(img, quality=80, scans=dup))
            assert (h, w) == img.shape
        except ValueError:
            pass


def test_progressive_scan_header_bounds_classified():
    """Byte-patched SOS headers with out-of-range or inverted spectral
    selection (Se > 63, Ss > Se, DC scan with Se != 0) must raise
    ValueError — never an index error out of the coefficient walk."""
    import pytest

    from artan_spark.plans.jpeg import encode_jpeg_progressive

    img = _textured(16, 16)
    payload = encode_jpeg_progressive(img, quality=80)
    sos = []  # offsets of every SOS marker
    i = 2
    while True:
        i = payload.find(b"\xff\xda", i)
        if i < 0:
            break
        sos.append(i)
        i += 2
    assert len(sos) >= 3  # the default script has many scans
    # grayscale SOS layout: FFDA len(2) ncomp(1) [cid tsel](2) Ss Se AhAl
    ss_off = lambda m: m + 7
    se_off = lambda m: m + 8

    # first scan is the DC scan: Se != 0 on it
    b = bytearray(payload)
    b[se_off(sos[0])] = 5
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))

    # an AC scan with Se > 63
    b = bytearray(payload)
    b[se_off(sos[1])] = 200
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))

    # inverted band: Ss > Se on an AC scan
    b = bytearray(payload)
    b[ss_off(sos[1])] = 60
    b[se_off(sos[1])] = 10
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_progressive_hand_assembled_fixture_known_pixels():
    """Independence check the encoder round-trips can't give (ADVICE r7):
    a progressive stream HAND-ASSEMBLED byte-by-byte per T.81 (DC-first
    at Al=1, full-band AC-first, DC refinement; hand-built canonical
    Huffman tables, hand-packed entropy bits) decoded against pixel
    values computed here with the DIRECT T.81 IDCT cosine sum — a
    symmetric encoder/decoder deviation (e.g. a transposed IDCT, wrong
    canonical code order, wrong point-transform) fails this even though
    every round-trip test passes."""
    # frame: 8x8 grayscale, quant table all ones.
    # coefficients: DC (zigzag 0) = 32, AC zigzag 1 = natural (row 0,
    # col 1) = -5, everything else 0.
    stream = bytes(
        [0xFF, 0xD8]  # SOI
        # DQT: Pq=0 Tq=0, 64 x 1
        + [0xFF, 0xDB, 0x00, 0x43, 0x00] + [0x01] * 64
        # SOF2: 8-bit, 8x8, 1 component (id 1, 1x1 sampling, qt 0)
        + [0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08, 0x01, 0x01, 0x11, 0x00]
        # DHT class 0 id 0: one symbol (category 5), code '0' (length 1)
        + [0xFF, 0xC4, 0x00, 0x14, 0x00, 0x01] + [0x00] * 15 + [0x05]
        # SOS 1: DC first, Ss=0 Se=0 Ah=0 Al=1.
        # bits: code '0' (cat 5) + '10000' (diff 16; DC = 16 << 1 = 32);
        # pad with 1s -> 0b01000011
        + [0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x00, 0x01, 0x43]
        # DHT class 1 id 0: symbols 0x03, 0x00 both at length 2 ->
        # canonical codes '00' and '01'
        + [0xFF, 0xC4, 0x00, 0x15, 0x10, 0x00, 0x02] + [0x00] * 14 + [0x03, 0x00]
        # SOS 2: AC first, Ss=1 Se=63 Ah=0 Al=0.
        # bits: '00' (run 0, cat 3) + '010' (-5: -5 + 2^3 - 1 = 2) +
        # '01' (EOB); pad -> 0b00010011
        + [0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x01, 0x3F, 0x00, 0x13]
        # SOS 3: DC refinement Ah=1 Al=0 — one raw bit per block: bit 0
        # of DC 32 is 0; pad -> 0b01111111
        + [0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x00, 0x10, 0x7F]
        + [0xFF, 0xD9]  # EOI
    )
    planes, h, w = decode_jpeg(stream)
    assert (h, w) == (8, 8) and len(planes) == 1

    # independent reference: the T.81 A.3.3 inverse DCT as an explicit
    # double cosine sum (not the decoder's matrix formulation)
    F = np.zeros((8, 8))
    F[0, 0] = 32.0  # DC
    F[0, 1] = -5.0  # first horizontal AC
    expect = np.empty((8, 8))
    c = lambda k: (1 / np.sqrt(2.0)) if k == 0 else 1.0
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += (
                        c(u) * c(v) * F[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            expect[y, x] = s / 4.0 + 128.0
    np.testing.assert_allclose(planes[0], expect, atol=1e-9)
