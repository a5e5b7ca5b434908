"""Streaming deduplication primitives.

The streaming counterpart of ``plans/dedup.dedup_exact``: on an unbounded
stream you cannot hold every fingerprint forever, so state must be bounded
by a watermark horizon — ``dropDuplicatesWithinWatermark`` keeps one
fingerprint per key within the horizon and drops it once the watermark
passes, giving exact dedup for any duplicate pair closer together than the
horizon with O(horizon-volume) state instead of O(stream) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(
    df: DataFrame,
    keys: list[str] | None = None,
    text_col: str = "text",
    event_time_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows from a stream, keyed by ``keys`` (default: the
    md5 of ``text_col``). Duplicates arriving within ``horizon`` of each
    other collapse to the first row; the state store is bounded by the
    horizon. Works on batch frames too (falls back to ``dropDuplicates``,
    same keys), so the one definition serves both modes."""
    if keys is None:
        df = df.withColumn("__fingerprint__", F.md5(F.col(text_col)))
        keys = ["__fingerprint__"]
    if not df.isStreaming:
        return df.dropDuplicates(keys).drop("__fingerprint__")
    out = df.withWatermark(event_time_col, horizon).dropDuplicatesWithinWatermark(keys)
    return out.drop("__fingerprint__")
