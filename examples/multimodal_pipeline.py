#!/usr/bin/env python
"""Multimodal ingestion pipeline: untrusted binary blobs -> typed features.

    raw blobs ──> sniff_media_type (magic bytes, pure Catalyst) ──┐
                                                                  v
                 decode_media (mapInPandas, Arrow-batched) ──> per-type stats

The sniff stage types every blob inside whole-stage codegen — no Python in
the row path — so a 100 TB media lake is classified at scan speed; only the
rows that reach the decoders cross into Python, in Arrow batches whose size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``. The real
dependency-free codecs (WAV/BMP/PGM/PPM/Y4M/GIF, PNG incl. palette and
Adam7, JPEG baseline AND progressive) decode actual file bytes; everything
gets probe_media container metadata (including MP4, whose FRAME decode
genuinely needs codec libs); image rows are thumbnailed by resize_images;
video rows are frame-sampled into PNG image rows by sample_video_frames;
the rest is quarantined, not guessed at.

Usage: python examples/multimodal_pipeline.py
"""

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.sources import session_builder


def make_blob_corpus(spark, n=120):
    """A synthetic lake of mixed raw-media blobs with NO type column."""
    from artan_spark.plans.multimodal import (
        encode_bmp,
        encode_pnm,
        encode_wav_pcm,
        encode_y4m,
    )

    from artan_spark.plans.jpeg import encode_jpeg_gray, encode_jpeg_progressive
    from artan_spark.plans.multimodal import encode_png

    rng = np.random.default_rng(11)
    rows = []
    for i in range(n):
        kind = i % 7
        if kind == 0:
            blob = encode_wav_pcm((rng.normal(0, 3000, 50 + i % 40)).astype(np.int16))
        elif kind == 1:
            blob = encode_bmp(rng.integers(0, 256, (8 + i % 8, 8), dtype=np.uint8))
        elif kind == 2:
            blob = encode_pnm(rng.integers(0, 256, (6, 6 + i % 6), dtype=np.uint8))
        elif kind == 3:
            blob = encode_y4m([rng.integers(0, 256, (4, 6), dtype=np.uint8) for _ in range(3 + i % 4)])
        elif kind == 4:
            # alternate plain / Adam7-interlaced PNG (both decode)
            blob = encode_png(
                rng.integers(0, 256, (9, 7 + i % 5), dtype=np.uint8), interlace=bool(i % 2)
            )
        elif kind == 5:
            # alternate baseline / progressive JPEG (both decode)
            img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
            blob = (
                encode_jpeg_progressive(img, quality=90)
                if i % 2
                else encode_jpeg_gray(img, quality=90)
            )
        else:
            # MP4: box metadata is probe-able, frame decode is not
            blob = b"\x00\x00\x00\x14ftypisom\x00\x00\x02\x00isom" + bytes(16)
        rows.append((i, bytearray(blob)))
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def main():
    from artan_spark.plans.mediaprobe import probe_media
    from artan_spark.plans.multimodal import (
        _REAL_EXTRACTORS,
        decode_media,
        resize_images,
        sniff_media_type,
    )

    spark = session_builder("MultimodalPipeline", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    blobs = make_blob_corpus(spark)
    typed = blobs.withColumn("media_type", sniff_media_type(F.col("payload")))

    decodable = set(_REAL_EXTRACTORS)
    ready = typed.filter(F.col("media_type").isin(*decodable))
    quarantine = typed.filter(~F.col("media_type").isin(*decodable) | F.col("media_type").isNull())

    feats = decode_media(
        ready.withColumn("payload_len", F.length("payload"))
             .select("doc_id", "media_type", "payload", "payload_len")
    )
    stats = feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_units"), 2).alias("avg_units"),
        F.round(F.avg("mean_intensity"), 2).alias("avg_intensity"),
        F.sum("payload_len").alias("bytes"),
    )
    print("== decoded feature stats ==")
    stats.orderBy("media_type").show(truncate=False)
    # container metadata for EVERY row — including the quarantined MP4s
    probe = probe_media(blobs)
    print("== probe_media metadata (all rows, no decode) ==")
    probe.groupBy("media_type", "codec").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("width"), 1).alias("avg_w"),
    ).orderBy("media_type").show(truncate=False)

    # thumbnail every decodable image to a fixed grid (PNG payloads out)
    thumbs = resize_images(typed, 8, 8)
    n_img = typed.filter(F.col("media_type").isin(
        "image/bmp", "image/png", "image/jpeg",
        "image/x-portable-graymap", "image/x-portable-pixmap")).count()
    assert thumbs.count() == n_img

    # sample every 2nd frame of each video row into real PNG image rows
    from artan_spark.plans.multimodal import sample_video_frames

    frames = sample_video_frames(typed, every=2)
    n_frames = frames.count()
    assert n_frames > 0
    print(f"== sampled {n_frames} video frames into PNG image rows ==")

    print("== quarantined (no built-in frame decoder) ==")
    quarantine.groupBy("media_type").count().show(truncate=False)
    n_q = quarantine.count()
    assert n_q == 17, n_q  # exactly the MP4 seventh of the 120-blob corpus
    mp4_meta = probe.filter(F.col("media_type") == "video/mp4").first()
    assert mp4_meta.codec is None or mp4_meta.codec == "mp4"  # ftyp-only blob
    spark.stop()
    print("multimodal pipeline OK")


if __name__ == "__main__":
    main()
