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
    jpeg = spark.createDataFrame(
        [(1, "image/jpeg", b"\xff\xd8\xff\xe0", 4)],
        "doc_id long, media_type string, payload binary, payload_len int",
    )
    with pytest.raises(Exception, match="no built-in codec"):
        decode_media(jpeg, fake=True).collect()


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
    # 500 docs at sf0.001, cycled by doc_id % 3 (doc_ids 0..499)
    assert out["image/fake"].n_items == 167
    assert out["audio/fake"].n_items == 167
    assert out["video/fake"].n_items == 166
    assert out["image/fake"].total_bytes == 167 * 72
