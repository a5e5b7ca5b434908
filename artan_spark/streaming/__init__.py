from artan_spark.streaming.dedup import streaming_dedup_exact
from artan_spark.streaming.harness import stream_transform

__all__ = ["stream_transform", "streaming_dedup_exact"]
