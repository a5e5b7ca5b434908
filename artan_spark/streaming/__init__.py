from artan_spark.streaming.harness import stream_transform

__all__ = ["stream_transform"]
