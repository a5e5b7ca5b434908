from artan_spark.streaming.anomaly import StreamingRollingZScore
from artan_spark.streaming.cms import StreamingCountMin
from artan_spark.streaming.cusum import StreamingCusum
from artan_spark.streaming.dedup import StreamingBloomDedup, streaming_dedup_exact
from artan_spark.streaming.funnel import StreamingFunnel
from artan_spark.streaming.harness import stream_transform
from artan_spark.streaming.heavyhitters import StreamingHeavyHitters
from artan_spark.streaming.neardup import minhash_bands, streaming_near_dup
from artan_spark.streaming.packer import StreamingPacker
from artan_spark.streaming.quantiles import StreamingQuantiles
from artan_spark.streaming.reservoir import StreamingWeightedReservoir

__all__ = [
    "stream_transform",
    "StreamingBloomDedup",
    "StreamingCountMin",
    "StreamingCusum",
    "StreamingFunnel",
    "StreamingHeavyHitters",
    "StreamingPacker",
    "StreamingRollingZScore",
    "StreamingQuantiles",
    "StreamingWeightedReservoir",
    "streaming_dedup_exact",
    "minhash_bands",
    "streaming_near_dup",
]
