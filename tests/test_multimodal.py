"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
deterministic stub decode for all three media types, and the
NotImplementedError gate for real codecs."""

import struct

import pytest

from artan_spark.plans.multimodal import (
    attach_fake_media,
    decode_image,
    decode_media,
    multimodal_features,
)
from artan_spark.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_attach_media_schema_and_payloads(spark):
    media = attach_fake_media(spark, SF_DIR)
    assert [f.name for f in media.schema.fields] == ["doc_id", "media_type", "payload", "payload_len"]
    rows = media.orderBy("doc_id").limit(6).collect()
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)
    assert all(r.payload_len == len(r.payload) for r in rows)
    assert [r.media_type for r in rows] == [
        "image/fake", "audio/fake", "video/fake",
        "image/fake", "audio/fake", "video/fake",
    ]
    # deterministic: same doc -> same payload
    again = attach_fake_media(spark, SF_DIR).orderBy("doc_id").limit(6).collect()
    assert [bytes(r.payload) for r in rows] == [bytes(r.payload) for r in again]


def test_decode_stub_gate(spark):
    # fake media types still require opting in — production callers must not
    # silently consume stub features (the error surfaces at execution, where
    # the per-row media_type dispatch happens)
    with pytest.raises(Exception, match="fake=True"):
        decode_media(attach_fake_media(spark, SF_DIR), fake=False).collect()
    with pytest.raises(NotImplementedError):
        decode_image(None, fake=False)
    # genuinely codec-requiring types are NotImplemented regardless of flags
    mp4 = spark.createDataFrame(
        [(1, "video/mp4", b"\x00\x00\x00 ftypisom", 12)],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    with pytest.raises(Exception, match="no built-in codec"):
        decode_media(mp4, fake=True).collect()


def test_wav_codec_real_bytes(spark):
    """The audio/wav path decodes REAL RIFF/PCM bytes — no fake flag, no
    codec library: 16-bit and 8-bit files round-tripped through the
    canonical encoder and verified against closed-form amplitude means."""
    import numpy as np

    from artan_spark.plans.multimodal import _wav_features, encode_wav_pcm

    s16 = np.array([0, 1000, -1000, 30000, -30000, 5], dtype=np.int16)
    payload16 = encode_wav_pcm(s16, sample_rate=44100, bits=16)
    assert payload16[:4] == b"RIFF" and payload16[8:12] == b"WAVE"
    w, h, n, mean_abs = _wav_features(0, payload16)
    assert (w, h) == (None, None)
    assert n == len(s16)
    assert mean_abs == round(float(np.abs(s16.astype(np.float64)).mean()), 6)

    s8 = np.array([128, 129, 127, 255, 0], dtype=np.uint8)  # 8-bit WAV is unsigned
    _, _, n8, mean8 = _wav_features(0, encode_wav_pcm(s8, bits=8))
    assert n8 == 5
    assert mean8 == round(float(np.abs(s8.astype(np.float64) - 128.0).mean()), 6)

    # end-to-end through the Spark mapInPandas pipeline, mixed with fake rows
    media = spark.createDataFrame(
        [(10, "audio/wav", payload16, len(payload16))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    row = decode_media(media).collect()[0]  # note: NO fake flag needed
    assert row.media_type == "audio/wav" and row.n_units == len(s16)
    assert row.mean_intensity == round(float(np.abs(s16.astype(np.float64)).mean()), 6)


def test_bmp_codec_real_bytes(spark):
    """The image/bmp path decodes REAL BITMAPINFOHEADER BI_RGB bytes,
    honoring bottom-up row order and 4-byte row padding (w=3 -> 9 pixel
    bytes padded to 12 per row)."""
    import numpy as np

    from artan_spark.plans.multimodal import _bmp_features, encode_bmp

    px = np.array([[0, 128, 255], [10, 20, 30]], dtype=np.uint8)  # 3x2, padded rows
    payload = encode_bmp(px)
    assert payload[:2] == b"BM"
    w, h, n, mean_i = _bmp_features(0, payload)
    assert (w, h, n) == (3, 2, 6)
    assert mean_i == round(float(px.astype(np.float64).mean()), 6)

    media = spark.createDataFrame(
        [(11, "image/bmp", payload, len(payload))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    row = decode_media(media).collect()[0]
    assert (row.width, row.height, row.n_units) == (3, 2, 6)
    assert row.mean_intensity == round(float(px.astype(np.float64).mean()), 6)


def test_decode_image_features(spark):
    feats = decode_image(attach_fake_media(spark, SF_DIR), fake=True)
    row = feats.filter("doc_id = 6").collect()[0]  # 6 % 3 == 0 -> image
    assert row.width == 16 + 6 % 48 and row.height == 16 + 42 % 48
    assert row.n_units == 64
    assert 0.0 <= row.mean_intensity <= 255.0


def test_decode_audio_and_video_features(spark):
    feats = decode_media(attach_fake_media(spark, SF_DIR), fake=True)
    aud = feats.filter("doc_id = 7").collect()[0]  # 7 % 3 == 1 -> audio
    assert aud.media_type == "audio/fake"
    assert aud.width is None and aud.height is None
    assert aud.n_units == 32 + 7 % 32
    vid = feats.filter("doc_id = 5").collect()[0]  # 5 % 3 == 2 -> video
    assert vid.media_type == "video/fake"
    assert vid.width == 4 and vid.height == 4
    # n_frames = 4 + 5 % 4 = 5 -> frames 0, 2, 4 sampled
    assert vid.n_units == 3
    # decode reads the BYTES: recompute the sampled-frame mean directly
    n_frames = 5
    body = bytes((5 * 11 + i * 5) % 256 for i in range(n_frames * 16))
    sampled = b"".join(body[f * 16 : (f + 1) * 16] for f in range(0, n_frames, 2))
    assert vid.mean_intensity == round(sum(sampled) / len(sampled), 6)
    assert vid.payload_len == 12 + 16 * n_frames
    hdr = struct.pack("<III", n_frames, 4, 4)
    assert len(hdr) == 12


def test_multimodal_features_aggregate(spark):
    out = {r.media_type: r for r in multimodal_features(spark, SF_DIR).collect()}
    assert set(out) == {"image/fake", "audio/fake", "video/fake"}
    # media_type cycles by doc_id % 3 — derive expected counts from the
    # actual doc_id column (never fixture-size pins: the driver regenerates
    # sf0.001 and hardcoded cardinalities break — r9 verdict)
    ids = [
        r.doc_id
        for r in read_table(spark, SF_DIR, "documents").select("doc_id").collect()
    ]
    assert len(ids) >= 10
    n_by_mod = {m: sum(1 for i in ids if i % 3 == m) for m in (0, 1, 2)}
    assert out["image/fake"].n_items == n_by_mod[0]
    assert out["audio/fake"].n_items == n_by_mod[1]
    assert out["video/fake"].n_items == n_by_mod[2]
    assert out["image/fake"].total_bytes == n_by_mod[0] * 72  # fixed 72 B/image


def test_y4m_codec_real_bytes(spark):
    """The video/x-yuv4mpeg path decodes REAL YUV4MPEG2 bytes: text stream
    header, FRAME markers, planar YUV offsets — sampling every 2nd frame's
    luma, exactly like the fake-video extractor's decimation pattern."""
    import numpy as np

    from artan_spark.plans.multimodal import _y4m_features, encode_y4m

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(6, 8), dtype=np.uint8) for _ in range(5)]
    payload = encode_y4m(frames, fps=(25, 1), colorspace="C420jpeg")
    assert payload.startswith(b"YUV4MPEG2 W8 H6 F25:1")
    w, h, n, mean_i = _y4m_features(0, payload)
    assert (w, h, n) == (8, 6, 3)  # frames 0, 2, 4 sampled
    expect = np.stack([frames[0], frames[2], frames[4]]).astype(np.float64).mean()
    assert mean_i == round(float(expect), 6)

    # mono (no chroma planes) exercises the other plane-size branch
    mono = encode_y4m(frames[:4], colorspace="Cmono")
    _, _, n_m, mean_m = _y4m_features(0, mono)
    assert n_m == 2
    assert mean_m == round(float(np.stack([frames[0], frames[2]]).astype(np.float64).mean()), 6)

    # end-to-end through the Spark mapInPandas pipeline — NO fake flag
    media = spark.createDataFrame(
        [(12, "video/x-yuv4mpeg", payload, len(payload))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    row = decode_media(media).collect()[0]
    assert (row.width, row.height, row.n_units) == (8, 6, 3)
    assert row.mean_intensity == round(float(expect), 6)


def test_pnm_codec_real_bytes(spark):
    """image/x-portable-graymap (P5) and -pixmap (P6) decode real binary
    netpbm bytes, including header comments the spec allows."""
    import numpy as np

    from artan_spark.plans.multimodal import _pnm_features, encode_pnm

    gray = np.array([[0, 100, 200], [50, 150, 250]], dtype=np.uint8)
    p5 = encode_pnm(gray)
    assert p5.startswith(b"P5\n3 2\n255\n")
    assert _pnm_features(0, p5) == (3, 2, 6, round(float(gray.astype(np.float64).mean()), 6))

    # comment lines between header tokens must be skipped
    commented = b"P5\n# made by a netpbm tool\n3 2\n# maxval next\n255\n" + gray.tobytes()
    assert _pnm_features(0, commented) == _pnm_features(0, p5)

    rgb = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3) * 10
    p6 = encode_pnm(rgb, ppm=True)
    w, h, n, mean_i = _pnm_features(0, p6)
    assert (w, h, n) == (2, 2, 4)
    assert mean_i == round(float(rgb.astype(np.float64).mean(axis=2).mean()), 6)

    media = spark.createDataFrame(
        [
            (13, "image/x-portable-graymap", p5, len(p5)),
            (14, "image/x-portable-pixmap", p6, len(p6)),
        ],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    rows = {r.doc_id: r for r in decode_media(media).collect()}
    assert (rows[13].width, rows[13].height, rows[13].n_units) == (3, 2, 6)
    assert (rows[14].width, rows[14].height, rows[14].n_units) == (2, 2, 4)


def test_media_type_sniffing(spark):
    """Magic-byte sniffing: the Catalyst column expression and the
    driver-side helper agree, recognize every built-in codec's output, and
    return NULL/None for junk. The sniff column must stay inside
    whole-stage codegen (no Python eval in the plan)."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        decode_media,
        detect_media_type,
        encode_bmp,
        encode_pnm,
        encode_wav_pcm,
        encode_y4m,
        sniff_media_type,
    )
    from pyspark.sql import functions as F

    wav = encode_wav_pcm(np.array([1, -1], dtype=np.int16))
    bmp = encode_bmp(np.zeros((2, 2), dtype=np.uint8))
    pgm = encode_pnm(np.zeros((2, 2), dtype=np.uint8))
    ppm = encode_pnm(np.zeros((2, 2, 3), dtype=np.uint8), ppm=True)
    y4m = encode_y4m([np.zeros((2, 2), dtype=np.uint8)])
    cases = {
        1: (wav, "audio/wav"),
        2: (bmp, "image/bmp"),
        3: (pgm, "image/x-portable-graymap"),
        4: (ppm, "image/x-portable-pixmap"),
        5: (y4m, "video/x-yuv4mpeg"),
        6: (b"\xff\xd8\xff\xe0junk", "image/jpeg"),
        7: (b"\x89PNG\r\n\x1a\njunk", "image/png"),
        8: (b"\x00\x00\x00 ftypisom", "video/mp4"),
        9: (b"totally not media", None),
    }
    for payload, want in cases.values():
        assert detect_media_type(payload) == want

    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, (v, _) in cases.items()],
        "doc_id long, payload binary",
    )
    typed = df.withColumn("media_type", sniff_media_type(F.col("payload")))
    got = {r.doc_id: r.media_type for r in typed.collect()}
    assert got == {k: want for k, (_, want) in cases.items()}
    plan = typed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # sniff -> decode end-to-end: untyped blobs to typed features
    feats = decode_media(
        typed.filter("media_type IS NOT NULL AND doc_id <= 5")
             .withColumn("payload_len", F.length("payload"))
             .select("doc_id", "media_type", "payload", "payload_len")
    )
    rows = {r.doc_id: r for r in feats.collect()}
    assert rows[1].n_units == 2 and rows[2].width == 2 and rows[5].n_units == 1


def test_image_dhash_codec_invariance_and_noise_robustness():
    """The perceptual hash is a function of the PIXELS: identical images
    through BMP and PGM round-trips hash identically, and a few-pixel
    perturbation moves the hash by at most a few bits while an independent
    image is far away."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        _bmp_gray,
        _png_gray,
        _pnm_gray,
        encode_bmp,
        encode_png,
        encode_pnm,
        image_dhash,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)

    h_bmp = image_dhash(_bmp_gray(encode_bmp(img)))
    h_pgm = image_dhash(_pnm_gray(encode_pnm(img)))
    h_png = image_dhash(_png_gray(encode_png(img, filters="mixed")))
    h_adam7 = image_dhash(_png_gray(encode_png(img, filters="mixed", interlace=True)))
    gray_pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    h_plte = image_dhash(_png_gray(encode_png(img, palette=gray_pal)))
    assert h_bmp == h_pgm == h_png == h_adam7 == h_plte

    noisy = img.copy()
    noisy[5, 7] = 255 - noisy[5, 7]
    noisy[20, 13] = 255 - noisy[20, 13]
    h_noisy = image_dhash(_pnm_gray(encode_pnm(noisy)))
    assert bin(h_bmp ^ h_noisy).count("1") <= 6

    other = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    h_other = image_dhash(_pnm_gray(encode_pnm(other)))
    assert bin(h_bmp ^ h_other).count("1") > 6


def test_image_near_dup_pairs_banded_join(spark):
    """End-to-end image near-dup: a noisy copy pairs with its original via
    the banded hamming join (exact by pigeonhole at <= 6 flips), an
    unrelated image does not, and mixed codecs (BMP vs PGM vs PNG)
    interoperate."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        encode_bmp,
        encode_png,
        encode_pnm,
        image_near_dup_pairs,
    )

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    noisy = base.copy()
    noisy[3, 4] = 255 - noisy[3, 4]
    other = rng.randint(0, 256, (24, 24)).astype(np.uint8)

    rows = [
        (1, "image/bmp", bytearray(encode_bmp(base))),
        (2, "image/x-portable-graymap", bytearray(encode_pnm(noisy))),
        (3, "image/bmp", bytearray(encode_bmp(other))),
        (4, "image/png", bytearray(encode_png(noisy, filters="mixed"))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in image_near_dup_pairs(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 4) in pairs and pairs[(1, 4)] <= 6
    assert (2, 4) in pairs and pairs[(2, 4)] == 0  # same pixels, different codec
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_fingerprint_noise_robust_and_near_dup_pairs(spark):
    """Audio energy-delta fingerprints: a low-amplitude-noise copy of a
    signal pairs with its original via the shared banded hamming join, an
    unrelated signal does not, and the fingerprint survives the WAV
    encode/decode round-trip."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        _wav_samples,
        audio_fingerprint,
        audio_near_dup_pairs,
        encode_wav_pcm,
    )

    rng = np.random.RandomState(5)
    t = np.arange(16000)
    base = (3000 * np.sin(t / 50.0) + 1500 * np.sin(t / 7.0)).astype(np.int16)
    noisy = (base + rng.randint(-30, 31, len(base))).astype(np.int16)
    other = (3000 * np.sin(t / 11.0) * np.exp(-t / 8000.0)).astype(np.int16)

    # round-trip invariance: fingerprint of encoded+decoded == of the raw signal
    assert audio_fingerprint(_wav_samples(encode_wav_pcm(base))) == audio_fingerprint(
        base.astype(np.float64)
    )

    rows = [
        (1, "audio/wav", bytearray(encode_wav_pcm(base))),
        (2, "audio/wav", bytearray(encode_wav_pcm(noisy))),
        (3, "audio/wav", bytearray(encode_wav_pcm(other))),
        (4, "image/bmp", bytearray(b"BM....")),  # non-audio rows are scoped out
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    # default = SPECTRAL fingerprint; "energy" is the explicit fallback —
    # both must pair the noisy copy and reject the unrelated signal
    for kwargs in ({}, {"method": "energy"}):
        pairs = {
            (r.doc_a, r.doc_b): r.hamming
            for r in audio_near_dup_pairs(media, **kwargs).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 6, kwargs
        assert (1, 3) not in pairs and (2, 3) not in pairs, kwargs

    import pytest

    with pytest.raises(ValueError, match="method"):
        audio_near_dup_pairs(media, method="nope")


def test_video_fingerprint_near_dup_pairs(spark):
    """Video near-dup: a noisy copy of a clip pairs with the original via
    the mean-luma dHash + shared banded join; an unrelated clip does not;
    the Y4M feature extractor still agrees with the shared frame walk."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        _y4m_features,
        encode_y4m,
        video_fingerprint,
        video_near_dup_pairs,
    )

    rng = np.random.RandomState(9)
    base = [rng.randint(0, 256, (24, 32)).astype(np.uint8) for _ in range(6)]
    noisy = [
        np.clip(f.astype(int) + rng.randint(-8, 9, f.shape), 0, 255).astype(np.uint8)
        for f in base
    ]
    other = [rng.randint(0, 256, (24, 32)).astype(np.uint8) for _ in range(6)]

    pay_base = encode_y4m(base)
    assert _y4m_features(0, pay_base)[2] == 3  # every-2nd-frame sampling intact
    assert isinstance(video_fingerprint(pay_base), int)

    rows = [
        (1, "video/x-yuv4mpeg", bytearray(pay_base)),
        (2, "video/x-yuv4mpeg", bytearray(encode_y4m(noisy))),
        (3, "video/x-yuv4mpeg", bytearray(encode_y4m(other))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in video_near_dup_pairs(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_png_codec_real_bytes(spark):
    """The image/png path decodes REAL PNG bytes — stdlib zlib IDAT
    inflate + scanline unfilter — with all 5 filter types exercised
    (filters="mixed" cycles None/Sub/Up/Average/Paeth), grayscale and RGB,
    through the same mapInPandas decode as every other codec."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        _png_features,
        _png_gray,
        encode_png,
    )

    rng = np.random.RandomState(5)
    # >= 5 rows so the mixed-filter encoder hits every filter type
    gray = rng.randint(0, 256, (13, 7)).astype(np.uint8)
    for filters in ("mixed", "none"):
        payload = encode_png(gray, filters=filters)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(_png_gray(payload), gray.astype(np.float64))

    rgb = rng.randint(0, 256, (11, 5, 3)).astype(np.uint8)
    payload = encode_png(rgb, filters="mixed")
    assert np.allclose(_png_gray(payload), rgb.astype(np.float64).mean(axis=2))
    w, h, n, mean_i = _png_features(0, payload)
    assert (w, h, n) == (5, 11, 55)
    assert mean_i == round(float(rgb.astype(np.float64).mean(axis=2).mean()), 6)

    media = spark.createDataFrame(
        [(21, "image/png", bytearray(encode_png(gray)), 0)],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    row = decode_media(media).collect()[0]
    assert (row.width, row.height, row.n_units) == (7, 13, 91)
    assert row.mean_intensity == round(float(gray.astype(np.float64).mean()), 6)


def test_png_unsupported_variants_raise():
    """Sub-byte depths raise actionably (16-bit decodes since round 8);
    malformed palette/interlace metadata and corrupt chunks fail loudly
    rather than decoding garbage."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from artan_spark.plans.multimodal import _png_chunk, _png_gray, encode_png

    def with_ihdr(depth, color_type, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color_type, 0, 0, interlace)
        body = bytes([0, 0, 0, 0, 0, 0]) if color_type == 0 else bytes(8)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(body))
            + _png_chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="4-bit"):
        _png_gray(with_ihdr(4, 0, 0))
    with pytest.raises(ValueError, match="16-bit palette"):
        _png_gray(with_ihdr(16, 3, 0))  # PLTE indices are at most 8 bits
    with pytest.raises(ValueError, match="PLTE"):
        _png_gray(with_ihdr(8, 3, 0))  # palette stream without a PLTE chunk
    with pytest.raises(ValueError, match="interlace"):
        _png_gray(with_ihdr(8, 0, 2))  # invalid interlace method
    with pytest.raises(ValueError, match="not a PNG"):
        _png_gray(b"BMnope")

    good = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
    good[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        _png_gray(bytes(good))


def test_png_palette_and_adam7_roundtrip():
    """Color type 3 (PLTE lookup) and Adam7 interlacing — both directions
    through the built-in codec, all filter types, odd sizes, and combined
    palette+interlaced streams; out-of-range palette indices rejected."""
    import numpy as np
    import pytest

    from artan_spark.plans.multimodal import _png_gray, encode_png

    rng = np.random.RandomState(11)
    for shape in [(13, 17), (8, 8), (31, 9), (1, 1), (2, 3), (9, 31, 3)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        ref = img.astype(np.float64) if img.ndim == 2 else img.astype(np.float64).mean(axis=2)
        for filters in ("none", "mixed"):
            got = _png_gray(encode_png(img, filters=filters, interlace=True))
            np.testing.assert_array_equal(got, ref, err_msg=f"{shape} {filters}")

    pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, size=(21, 13)).astype(np.uint8)
    want = pal[idx].astype(np.float64).mean(axis=2)
    np.testing.assert_array_equal(_png_gray(encode_png(idx, palette=pal)), want)
    np.testing.assert_array_equal(
        _png_gray(encode_png(idx, palette=pal, interlace=True)), want
    )

    with pytest.raises(ValueError, match="index out of range"):
        _png_gray(encode_png(idx, palette=pal[:8]))  # indices exceed palette


def test_png_alpha_color_types_decode():
    """Color types 4 (gray+alpha) and 6 (RGBA) decode with alpha dropped —
    hand-built payloads since the encoder only writes types 0 and 2."""
    import struct
    import zlib

    import numpy as np

    from artan_spark.plans.multimodal import _png_chunk, _png_gray

    def build(color_type, channels, pixels):
        h, w, _ = pixels.shape
        body = bytearray()
        for r in range(h):
            body += b"\x00" + pixels[r].tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
            + _png_chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(9)
    ga = rng.randint(0, 256, (5, 4, 2)).astype(np.uint8)  # gray+alpha
    out = _png_gray(build(4, 2, ga))
    assert np.array_equal(out, ga[:, :, 0].astype(np.float64))  # alpha dropped

    rgba = rng.randint(0, 256, (6, 3, 4)).astype(np.uint8)
    out = _png_gray(build(6, 4, rgba))
    assert np.allclose(out, rgba[:, :, :3].astype(np.float64).mean(axis=2))


def test_resize_images_pipeline(spark):
    """Thumbnailing: every decodable image type resizes to the target
    grid, output payloads are real PNGs that round-trip through the same
    decoder, content survives (correlation with a directly-downsampled
    original), and non-image rows are scoped out."""
    import numpy as np

    from artan_spark.plans.jpeg import encode_jpeg_gray
    from artan_spark.plans.multimodal import (
        _png_gray,
        block_mean_resize,
        encode_bmp,
        encode_png,
        encode_pnm,
        encode_wav_pcm,
        resize_images,
    )

    rng = np.random.RandomState(4)
    yy, xx = np.mgrid[0:48, 0:64]
    img = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).clip(0, 255).astype(np.uint8)
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(img))),
        (2, "image/png", bytearray(encode_png(img))),
        (3, "image/jpeg", bytearray(encode_jpeg_gray(img, quality=95))),
        (4, "image/x-portable-graymap", bytearray(encode_pnm(img))),
        (5, "audio/wav", bytearray(encode_wav_pcm(np.zeros(100, dtype=np.int16)))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r for r in resize_images(media, 16, 16).collect()}
    assert set(out) == {1, 2, 3, 4}  # wav scoped out
    want = block_mean_resize(img.astype(np.float64), 16, 16)
    for doc_id, r in out.items():
        assert (r.width, r.height, r.media_type) == (16, 16, "image/png")
        back = _png_gray(bytes(r.payload))
        assert back.shape == (16, 16)
        a = back.ravel() - back.mean()
        b = want.ravel() - want.mean()
        corr = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert corr > 0.99, (doc_id, corr)

    # exactness for the lossless sources: within rounding of the kernel
    assert np.abs(_png_gray(bytes(out[1].payload)) - want).max() <= 0.5

    # nearest-neighbor upsample path
    up = {r.doc_id: r for r in resize_images(media.filter("doc_id = 1"), 96, 128).collect()}
    assert _png_gray(bytes(up[1].payload)).shape == (96, 128)

    import pytest

    with pytest.raises(ValueError, match="positive"):
        resize_images(media, 0, 16)

    # junk tolerance: a corrupt payload drops its row, not the batch
    junk = rows[:2] + [(9, "image/png", bytearray(b"\x89PNG\r\n\x1a\ngarbage"))]
    jm = spark.createDataFrame(junk, "doc_id long, media_type string, payload binary")
    assert {r.doc_id for r in resize_images(jm, 8, 8).collect()} == {1, 2}


def test_block_mean_resize_mixed_axes():
    """A taller-but-narrower request must still area-average the shrinking
    axis (columns) while nearest-neighbor upsampling the growing one."""
    import numpy as np

    from artan_spark.plans.multimodal import block_mean_resize

    g = np.arange(4 * 6, dtype=np.float64).reshape(4, 6)
    out = block_mean_resize(g, 8, 3)  # rows grow 4->8, cols shrink 6->3
    assert out.shape == (8, 3)
    # each output row duplicates a source row; columns are 2-pixel means
    want_cols = (g[:, 0::2] + g[:, 1::2]) / 2.0
    ri = (np.arange(8) * 4) // 8
    np.testing.assert_allclose(out, want_cols[ri])

    # pure downsample stays bit-identical to the one-shot block mean
    h = np.arange(12 * 10, dtype=np.float64).reshape(12, 10)
    rb, cb = (np.arange(3) * 12) // 3, (np.arange(5) * 10) // 5
    small = np.add.reduceat(np.add.reduceat(h, rb, axis=0), cb, axis=1)
    counts = np.outer(np.diff(np.append(rb, 12)), np.diff(np.append(cb, 10)))
    np.testing.assert_array_equal(block_mean_resize(h, 3, 5), small / counts)


def test_audio_spectral_fingerprint_properties(spark):
    """The spectral fingerprint is gain-invariant, noise-robust,
    WAV-round-trip stable — and frequency-SENSITIVE where the time-domain
    energy fingerprint is blind: two tones with identical energy
    envelopes collide under energy deltas but sit far apart spectrally."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        _wav_samples,
        audio_spectral_fingerprint,
        audio_spectral_near_dup_pairs,
        encode_wav_pcm,
    )

    rng = np.random.RandomState(2)
    t = np.arange(16000) / 16000.0
    sig = (8000 * np.sin(2 * np.pi * 440 * t)
           + 4000 * np.sin(2 * np.pi * 1750 * t) * (t < 0.5)).astype(np.int16)
    h = audio_spectral_fingerprint(sig)

    # gain invariance + WAV round-trip exactness
    assert audio_spectral_fingerprint((sig * 0.5).astype(np.int16)) == h
    assert audio_spectral_fingerprint(_wav_samples(encode_wav_pcm(sig))) == h

    # mild broadband noise: within the banded-join radius
    noisy = (sig + rng.normal(0, 200, len(sig))).astype(np.int16)
    assert bin(h ^ audio_spectral_fingerprint(noisy)).count("1") <= 6

    # the motivating case: same constant energy envelope, different pitch.
    # The spectral bits separate by CONTENT; the energy-delta bits on a
    # flat envelope are phase artifacts of the frame grid — not a
    # meaningful discriminator either way (unused here; see
    # audio_fingerprint's own tests for its envelope-shaped domain).
    tone_a = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    tone_b = (8000 * np.sin(2 * np.pi * 2093 * t)).astype(np.int16)
    assert bin(
        audio_spectral_fingerprint(tone_a) ^ audio_spectral_fingerprint(tone_b)
    ).count("1") > 6

    # end-to-end banded pair join: noisy copy pairs, different pitch doesn't
    rows = [
        (1, "audio/wav", bytearray(encode_wav_pcm(sig))),
        (2, "audio/wav", bytearray(encode_wav_pcm(noisy))),
        (3, "audio/wav", bytearray(encode_wav_pcm(tone_b))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    pairs = {(r.doc_a, r.doc_b) for r in audio_spectral_near_dup_pairs(media).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_png_property_roundtrip_and_truncation_fuzz():
    """Random shapes/contents round-trip EXACTLY (PNG is lossless) for
    gray and RGB with both filter strategies; truncated payloads raise
    cleanly (ValueError/NotImplementedError, never a bare struct/index
    error)."""
    import numpy as np
    import pytest

    from artan_spark.plans.multimodal import _png_gray, encode_png

    rng = np.random.RandomState(23)
    for _ in range(10):
        h = int(rng.randint(1, 50))
        w = int(rng.randint(1, 50))
        filters = "mixed" if rng.rand() < 0.5 else "none"
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert np.array_equal(_png_gray(encode_png(g, filters=filters)), g)
        c = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.allclose(
            _png_gray(encode_png(c, filters=filters)), c.astype(np.float64).mean(axis=2)
        )

    src = rng.randint(0, 256, (20, 20)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    variants = [
        ("plain", encode_png(src)),
        ("adam7", encode_png(src, interlace=True)),
        ("palette", encode_png(src, palette=pal)),
        ("palette+adam7", encode_png(src, palette=pal, interlace=True)),
    ]
    for tag, payload in variants:
        want = src.astype(np.float64) if "palette" not in tag else pal[src].astype(np.float64).mean(axis=2)
        for cut in (4, 10, 30, len(payload) // 2, len(payload) - 5):
            try:
                out = _png_gray(payload[:cut])
                # tolerated only when the IDAT survived (the cut landed
                # inside the trailing IEND chunk): decode must then be EXACT
                assert np.array_equal(out, want), tag
            except (ValueError, NotImplementedError):
                pass  # clean parser rejection (never a bare struct/zlib error)
        # single-bit corruption never escapes the classified errors
        for _ in range(60):
            b = bytearray(payload)
            b[int(rng.randint(8, len(b)))] ^= 1 << int(rng.randint(8))
            try:
                _png_gray(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_gif_codec_real_bytes(spark):
    """image/gif decodes REAL GIF89a bytes — pure-Python LZW with
    variable-width LSB-first codes, grayscale palette round trip EXACT,
    interlaced streams de-interlaced, dHash codec-invariant with the
    other lossless formats, and end-to-end through decode_media."""
    import numpy as np

    from artan_spark.plans.multimodal import (
        _bmp_gray,
        _gif_gray,
        encode_bmp,
        encode_gif,
        image_dhash,
    )

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (24, 17)).astype(np.uint8)
    payload = encode_gif(img)
    assert payload[:6] == b"GIF89a"
    assert np.array_equal(_gif_gray(payload), img.astype(np.float64))

    # codec invariance with the other lossless decoders
    assert image_dhash(_gif_gray(payload)) == image_dhash(_bmp_gray(encode_bmp(img)))

    # interlaced: encode rows in interlace order, patch the interlace flag
    ih = 24
    rows = np.concatenate(
        [np.arange(0, ih, 8), np.arange(4, ih, 8), np.arange(2, ih, 4), np.arange(1, ih, 2)]
    )
    inter = encode_gif(img[rows])
    patched = bytearray(inter)
    desc = inter.index(b"\x2c", 6 + 7 + 768 - 1)  # image descriptor after GCT
    patched[desc + 9] |= 0x40
    assert np.array_equal(_gif_gray(bytes(patched)), img.astype(np.float64))

    # LZW actually compresses structured content
    smooth = ((np.mgrid[0:64, 0:64][1] // 8) * 16).astype(np.uint8)
    assert len(encode_gif(smooth)) < 64 * 64 // 2

    # end-to-end sniff -> decode_media
    media = spark.createDataFrame(
        [(41, "image/gif", bytearray(payload), len(payload))],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    row = decode_media(media).collect()[0]
    assert (row.width, row.height, row.n_units) == (17, 24, 408)
    assert row.mean_intensity == round(float(img.astype(np.float64).mean()), 6)

    # truncation fuzz: clean ValueError everywhere
    for cut in (3, 8, 20, len(payload) // 2):
        with pytest.raises(ValueError):
            _gif_gray(payload[:cut])


def test_sample_video_frames_pipeline(spark):
    """Frame sampling: every k-th luma frame lands as a real PNG row that
    round-trips pixel-exact, frame indices are right, junk rows drop, and
    the sampled frames feed straight back into the image pipeline."""
    import numpy as np
    import pytest

    from artan_spark.plans.multimodal import (
        _png_gray,
        decode_media,
        encode_y4m,
        sample_video_frames,
    )

    rng = np.random.RandomState(21)
    frames = [rng.randint(0, 256, (12, 16)).astype(np.uint8) for _ in range(5)]
    rows = [
        (1, "video/x-yuv4mpeg", bytearray(encode_y4m(frames))),
        (2, "video/x-yuv4mpeg", bytearray(b"YUV4MPEG2 garbage")),
        (3, "image/png", bytearray(b"\x89PNG\r\n\x1a\nnot a video")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = sample_video_frames(media, every=2).collect()
    assert {r.doc_id for r in out} == {1}  # junk + non-video scoped out/dropped
    by_idx = {r.frame_idx: r for r in out}
    assert sorted(by_idx) == [0, 2, 4]
    for idx, r in by_idx.items():
        assert (r.width, r.height, r.media_type) == (16, 12, "image/png")
        np.testing.assert_array_equal(_png_gray(bytes(r.payload)), frames[idx].astype(np.float64))

    # sampled frames are ordinary image rows for the rest of the pipeline
    feats = decode_media(
        sample_video_frames(media, every=4).select("doc_id", "media_type", "payload")
    ).collect()
    assert len(feats) == 2  # frames 0 and 4

    with pytest.raises(ValueError, match="positive"):
        sample_video_frames(media, every=0)


def test_png_hand_filtered_fixture_known_pixels():
    """Independence check for the self-paired PNG filter logic (the same
    class as the round-8 JPEG zigzag bug): a PNG whose IDAT is built
    HERE — filter bytes applied per the RFC 2083 formulas written out in
    this test, compressed with stdlib zlib (independent of the repo
    encoder) — must decode to the stated pixel matrix through
    ``_png_gray``. One row per filter type 0..4 exercises None/Sub/Up/
    Average (floor((left+up)/2)) and the full Paeth predictor."""
    import struct
    import zlib

    import numpy as np

    from artan_spark.plans.multimodal import _png_chunk, _png_gray

    pixels = np.array(
        [
            [10, 20, 30, 200, 90, 15],  # filter 0 (None)
            [12, 22, 35, 190, 95, 255],  # filter 1 (Sub)
            [11, 25, 40, 180, 100, 0],  # filter 2 (Up)
            [13, 28, 45, 170, 110, 7],  # filter 3 (Average)
            [14, 30, 50, 160, 120, 9],  # filter 4 (Paeth)
        ],
        dtype=np.int32,
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    body = bytearray()
    h, w = pixels.shape
    for r in range(h):
        ft = r  # row r uses filter type r
        body.append(ft)
        for x in range(w):
            raw = int(pixels[r, x])
            left = int(pixels[r, x - 1]) if x else 0
            up = int(pixels[r - 1, x]) if r else 0
            upleft = int(pixels[r - 1, x - 1]) if (r and x) else 0
            if ft == 0:
                f = raw
            elif ft == 1:
                f = raw - left
            elif ft == 2:
                f = raw - up
            elif ft == 3:
                f = raw - (left + up) // 2
            else:
                f = raw - paeth(left, up, upleft)
            body.append(f & 0xFF)

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )
    arr = _png_gray(payload)
    assert arr.shape == (h, w)
    np.testing.assert_array_equal(arr, pixels.astype(np.float64))


def test_gif_hand_assembled_lzw_fixture_known_pixels():
    """Independence check for the self-paired GIF LZW logic: a GIF89a
    stream hand-assembled here — LZW codes hand-chosen and LSB-first
    bit-packed per the GIF89a spec in this test, including the
    code-width bump at table size 2^width — must decode to the stated
    index matrix through ``_gif_gray``. A symmetric encoder/decoder
    deviation (bit order, early/deferred width change, clear/EOI
    handling) fails here even though round trips pass."""
    import numpy as np

    from artan_spark.plans.multimodal import _gif_gray

    # 4x2 image over a 4-entry gray palette; literal-code-only LZW:
    # CLEAR, 0, 1, 2 (table hits 8 -> width 3->4), 3, 3, 2, 1, 0, EOI
    codes = [(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (3, 4), (2, 4), (1, 4), (0, 4), (5, 4)]
    acc = nbits = 0
    packed = bytearray()
    for code, width in codes:  # LSB-first packing per GIF89a appendix F
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)

    payload = (
        b"GIF89a"
        + (4).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x81, 0, 0])  # GCT present, 4 entries; bg 0; aspect 0
        + bytes([0, 0, 0, 85, 85, 85, 170, 170, 170, 255, 255, 255])
        # image descriptor: separator, left=0, top=0, width=4, height=2,
        # flags=0 (no local table, not interlaced)
        + b"\x2c"
        + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
        + (4).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x00])
        + bytes([2])  # LZW minimum code size
        + bytes([len(packed)]) + bytes(packed) + b"\x00"  # sub-blocks
        + b"\x3b"  # trailer
    )
    arr = _gif_gray(payload)
    expect = np.array([[0, 85, 170, 255], [255, 170, 85, 0]], dtype=np.float64)
    np.testing.assert_array_equal(arr, expect)


def test_png_16bit_roundtrip_and_scale():
    """16-bit PNG (big-endian samples, byte-wise filters with doubled
    bpp): gray and RGB round-trip through every filter type and Adam7,
    intensities reported on the 8-bit scale (s / 257 — exact for
    x * 257), and a 16-bit re-encode of an 8-bit image decodes to the
    identical grayscale."""
    import numpy as np
    import pytest

    from artan_spark.plans.multimodal import _png_gray, encode_png

    rng = np.random.default_rng(8)
    g16 = rng.integers(0, 65536, size=(11, 7), dtype=np.uint16)
    for filters in ("none", "mixed"):
        got = _png_gray(encode_png(g16, filters=filters, depth=16))
        assert np.allclose(got, g16.astype(np.float64) / 257.0)
    got = _png_gray(encode_png(g16, depth=16, interlace=True))
    assert np.allclose(got, g16.astype(np.float64) / 257.0)

    rgb16 = rng.integers(0, 65536, size=(6, 9, 3), dtype=np.uint16)
    got = _png_gray(encode_png(rgb16, depth=16))
    assert np.allclose(got, rgb16.astype(np.float64).mean(axis=2) / 257.0)

    # x*257 widens 8-bit exactly: identical grayscale either way
    g8 = rng.integers(0, 256, size=(5, 8), dtype=np.uint8)
    wide = (g8.astype(np.uint16) * 257)
    assert np.array_equal(_png_gray(encode_png(g8)), _png_gray(encode_png(wide, depth=16)))

    with pytest.raises(ValueError, match="at most 8-bit"):
        encode_png(g8, palette=np.zeros((4, 3), dtype=np.uint8), depth=16)
