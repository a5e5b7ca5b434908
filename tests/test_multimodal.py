"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
deterministic stub decode, and the NotImplementedError gate for real codecs."""

import pytest

from artan_spark.plans.multimodal import attach_fake_media, decode_image, multimodal_features

SF_DIR = "/root/testdata/sf0.001"


def test_attach_media_schema_and_payloads(spark):
    media = attach_fake_media(spark, SF_DIR)
    assert [f.name for f in media.schema.fields] == ["doc_id", "media_type", "payload", "payload_len"]
    rows = media.orderBy("doc_id").limit(3).collect()
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)
    assert all(r.payload_len == len(r.payload) == 72 for r in rows)
    # deterministic: same doc -> same payload
    again = attach_fake_media(spark, SF_DIR).orderBy("doc_id").limit(3).collect()
    assert [bytes(r.payload) for r in rows] == [bytes(r.payload) for r in again]


def test_decode_stub_gate():
    with pytest.raises(NotImplementedError):
        decode_image(None, fake=False)


def test_decode_features(spark):
    feats = decode_image(attach_fake_media(spark, SF_DIR), fake=True)
    row = feats.filter("doc_id = 5").collect()[0]
    assert row.width == 16 + 5 % 48 and row.height == 16 + 35 % 48
    assert 0.0 <= row.mean_intensity <= 255.0


def test_multimodal_features_aggregate(spark):
    out = multimodal_features(spark, SF_DIR).collect()
    assert len(out) == 1
    assert out[0].n_items == 500
    assert out[0].total_bytes == 500 * 72
