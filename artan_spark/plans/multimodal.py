"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decode / feature-extract via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual image/audio codecs are NOT available
in this container, so ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic header-parse that exercises
the identical code path (documented stub per the build contract).

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
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
        StructField("payload_len", IntegerType()),
    ]
)


def attach_fake_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a deterministic binary payload per document: an 8-byte header
    (width, height as uint32 LE) + doc_id-seeded body. Stands in for real
    image bytes so the full binary-column path is exercised."""
    d = read_table(spark, sf_dir, "documents")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "payload": [], "payload_len": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h = 16 + int(doc_id) % 48, 16 + (int(doc_id) * 7) % 48
                body = bytes((int(doc_id) * 31 + i * 17) % 256 for i in range(64))
                payload = struct.pack("<II", w, h) + body
                rows["doc_id"].append(int(doc_id))
                rows["media_type"].append("image/fake")
                rows["payload"].append(payload)
                rows["payload_len"].append(len(payload))
            yield pd.DataFrame(rows)

    return d.select("doc_id", "n_chars").mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads -> (width, height, mean_intensity) features.

    Real decoding requires an image codec (Pillow/libvips), absent here —
    STUB: raises ``NotImplementedError`` unless ``fake=True``, which parses
    the deterministic fake header through the same mapInPandas pipeline.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True to run the deterministic header-parse stub"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                w, h = struct.unpack("<II", bytes(payload[:8]))
                body = bytes(payload[8:])
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["mean_intensity"].append(round(sum(body) / max(len(body), 1), 6))
                out["payload_len"].append(len(payload))
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: attach binary media -> decode (stub) -> per-type stats."""
    feats = decode_image(attach_fake_media(spark, sf_dir), fake=True)
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("width"), 6).alias("avg_width"),
        F.round(F.avg("height"), 6).alias("avg_height"),
        F.round(F.avg("mean_intensity"), 6).alias("avg_intensity"),
        F.sum("payload_len").alias("total_bytes"),
    )


# The fake payload is a closed-form function of doc_id (attach_fake_media):
# width = 16 + doc_id % 48, height = 16 + (doc_id*7) % 48, body byte i =
# (doc_id*31 + i*17) % 256 for i in 0..63, payload = 8-byte header + body.
# That makes the decoded per-type stats fully SQL-expressible: the oracle
# rebuilds mean_intensity via generate_series over the 64 body byte indices.
# mean_intensity = sum(body)/64 is an exact 6-binary-digit fraction, so the
# 6dp ROUND is an identity on both engines.
_MULTIMODAL_SQL = """
WITH body AS (
  SELECT d.doc_id,
         SUM((d.doc_id * 31 + i.i * 17) % 256) AS body_sum
  FROM documents d, generate_series(0, 63) AS i(i)
  GROUP BY d.doc_id
),
per_doc AS (
  SELECT doc_id,
         16 + doc_id % 48 AS width,
         16 + (doc_id * 7) % 48 AS height,
         ROUND(body_sum / 64.0, 6) AS mean_intensity,
         72 AS payload_len
  FROM body
)
SELECT 'image/fake' AS media_type,
       COUNT(*) AS n_items,
       ROUND(AVG(width), 6) AS avg_width,
       ROUND(AVG(height), 6) AS avg_height,
       ROUND(AVG(mean_intensity), 6) AS avg_intensity,
       CAST(SUM(payload_len) AS BIGINT) AS total_bytes
FROM per_doc
"""

QUERIES = {"multimodal_features": multimodal_features}
ORACLES = {"multimodal_features": _MULTIMODAL_SQL}
