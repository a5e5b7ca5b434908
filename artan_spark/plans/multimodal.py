"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decode / feature-extract via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual image/audio/video codecs are NOT
available in this container, so each ``decode_*`` raises
``NotImplementedError`` unless ``fake=True``, which parses a deterministic
header+body payload through the identical code path (documented stub per
the build contract). The decode functions only ever read the payload BYTES
— payload generation is the fake part, not the parsing.

Media layout of the fake payloads (all little-endian):

- ``image/fake``: header ``<II`` (width, height) + 64 intensity bytes
- ``audio/fake``: header ``<II`` (sample_rate, n_samples) + n_samples
  amplitude bytes
- ``video/fake``: header ``<III`` (n_frames, frame_w, frame_h) + n_frames
  x 16 frame-intensity bytes; feature extraction SAMPLES every 2nd frame
  (the frame-sample pattern for real video)

Scale design: payloads stay opaque bytes end-to-end (no driver collect);
``mapInPandas`` streams Arrow record batches through the Python worker, so
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of corpus size; metadata columns are plain columns that Catalyst
can prune/push down independently of the blob.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from artan_spark.sources import read_table

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("payload_len", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_units", IntegerType()),  # pixels-row / samples / sampled frames
        StructField("mean_intensity", DoubleType()),
        StructField("payload_len", IntegerType()),
    ]
)


def attach_fake_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a deterministic binary payload per document, cycling the three
    media types by doc_id % 3. Stands in for real media bytes so the full
    binary-column path (schema, Arrow batching, pruning) is exercised."""
    d = read_table(spark, sf_dir, "documents")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "payload": [], "payload_len": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                kind = doc_id % 3
                if kind == 0:
                    w, h = 16 + doc_id % 48, 16 + (doc_id * 7) % 48
                    body = bytes((doc_id * 31 + i * 17) % 256 for i in range(64))
                    payload = struct.pack("<II", w, h) + body
                    mtype = "image/fake"
                elif kind == 1:
                    n_samples = 32 + doc_id % 32
                    body = bytes((doc_id * 13 + i * 7) % 256 for i in range(n_samples))
                    payload = struct.pack("<II", 16000, n_samples) + body
                    mtype = "audio/fake"
                else:
                    n_frames = 4 + doc_id % 4
                    body = bytes((doc_id * 11 + i * 5) % 256 for i in range(n_frames * 16))
                    payload = struct.pack("<III", n_frames, 4, 4) + body
                    mtype = "video/fake"
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mtype)
                rows["payload"].append(payload)
                rows["payload_len"].append(len(payload))
            yield pd.DataFrame(rows)

    return d.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def _require_fake(fake: bool, codec: str) -> None:
    if not fake:
        raise NotImplementedError(
            f"{codec} codecs are not available in this environment; "
            "pass fake=True to run the deterministic header-parse stub"
        )


def _image_features(doc_id: int, payload: bytes) -> tuple:
    w, h = struct.unpack("<II", payload[:8])
    body = payload[8:]
    return (int(w), int(h), len(body), round(sum(body) / max(len(body), 1), 6))


def _audio_features(doc_id: int, payload: bytes) -> tuple:
    _rate, n_samples = struct.unpack("<II", payload[:8])
    body = payload[8 : 8 + n_samples]
    return (None, None, int(n_samples), round(sum(body) / max(len(body), 1), 6))


def _video_features(doc_id: int, payload: bytes) -> tuple:
    n_frames, fw, fh = struct.unpack("<III", payload[:12])
    body = payload[12:]
    # frame-sample: every 2nd frame, the standard decimation pattern
    sampled = [body[f * 16 : (f + 1) * 16] for f in range(0, n_frames, 2)]
    flat = b"".join(sampled)
    return (int(fw), int(fh), len(sampled), round(sum(flat) / max(len(flat), 1), 6))


_EXTRACTORS = {
    "image/fake": _image_features,
    "audio/fake": _audio_features,
    "video/fake": _video_features,
}


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads -> typed features per media type.

    image -> (width, height, n_pixels-bytes, mean intensity);
    audio -> (n_samples, mean amplitude);
    video -> (frame dims, n SAMPLED frames (every 2nd), their mean
    intensity). Real decoding requires image/audio/video codecs
    (Pillow/libsndfile/ffmpeg), absent here — STUB: raises
    ``NotImplementedError`` unless ``fake=True``, which parses the
    deterministic fake payloads through the same mapInPandas pipeline.
    """
    _require_fake(fake, "media")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                w, h, n_units, mean_i = _EXTRACTORS[mtype](int(doc_id), bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["width"].append(w)
                out["height"].append(h)
                out["n_units"].append(n_units)
                out["mean_intensity"].append(mean_i)
                out["payload_len"].append(len(payload))
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image-only decode (back-compat entry point): filters to image rows
    and runs the shared extractor."""
    _require_fake(fake, "image")
    return decode_media(media.filter(F.col("media_type") == "image/fake"), fake=True)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: attach binary media -> decode (stub) -> per-type stats."""
    feats = decode_media(attach_fake_media(spark, sf_dir), fake=True)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("n_units"), 6).alias("avg_units"),
        F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
        F.sum("payload_len").alias("total_bytes"),
    )


# Every fake payload is a closed-form function of doc_id (attach_fake_media),
# so the decoded per-type stats are fully SQL-expressible: the oracle
# rebuilds each body via generate_series over the byte indices. Per-doc
# means are exact small-denominator binary/decimal fractions only for the
# image case (sum/64); audio and video divide by data-dependent counts, so
# each per-doc mean is ROUNDed to 6dp on BOTH sides before averaging.
_MULTIMODAL_SQL = """
WITH img AS (
  SELECT d.doc_id,
         64 AS n_units,
         ROUND(SUM((d.doc_id * 31 + i.i * 17) % 256) / 64.0, 6) AS mean_intensity,
         72 AS payload_len
  FROM documents d, generate_series(0, 63) AS i(i)
  WHERE d.doc_id % 3 = 0
  GROUP BY d.doc_id
),
aud AS (
  SELECT d.doc_id,
         (32 + d.doc_id % 32) AS n_units,
         ROUND(SUM((d.doc_id * 13 + i.i * 7) % 256) * 1.0 / (32 + d.doc_id % 32), 6) AS mean_intensity,
         CAST(8 + (32 + d.doc_id % 32) AS INTEGER) AS payload_len
  FROM documents d, generate_series(0, 62) AS i(i)
  WHERE d.doc_id % 3 = 1 AND i.i < 32 + d.doc_id % 32
  GROUP BY d.doc_id
),
vid AS (
  -- sampled frames f = 0,2,...; byte index i in [16f, 16f+16).
  -- NB DuckDB / is float division; // is the integer one needed here.
  SELECT d.doc_id,
         CAST((5 + d.doc_id % 4) // 2 AS INTEGER) AS n_units,
         ROUND(SUM((d.doc_id * 11 + i.i * 5) % 256) * 1.0
               / (16 * ((5 + d.doc_id % 4) // 2)), 6) AS mean_intensity,
         CAST(12 + 16 * (4 + d.doc_id % 4) AS INTEGER) AS payload_len
  FROM documents d, generate_series(0, 127) AS i(i)
  WHERE d.doc_id % 3 = 2
    AND i.i < 16 * (4 + d.doc_id % 4)
    AND (i.i // 16) % 2 = 0
  GROUP BY d.doc_id
),
per_doc AS (
  SELECT 'image/fake' AS media_type, * FROM img
  UNION ALL
  SELECT 'audio/fake' AS media_type, * FROM aud
  UNION ALL
  SELECT 'video/fake' AS media_type, * FROM vid
)
SELECT media_type,
       COUNT(*) AS n_items,
       ROUND(AVG(n_units), 6) AS avg_units,
       ROUND(AVG(mean_intensity), 6) AS avg_intensity,
       CAST(SUM(payload_len) AS BIGINT) AS total_bytes
FROM per_doc
GROUP BY media_type
"""

QUERIES = {"multimodal_features": multimodal_features}
ORACLES = {"multimodal_features": _MULTIMODAL_SQL}
