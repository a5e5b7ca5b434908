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


# -- bounded-state approximate dedup ------------------------------------------

import hashlib

import numpy as np
import pandas as pd

from artan_spark.operators.base import STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.types import ArrayType, LongType, StringType, StructField, StructType

_BD_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("seq", LongType()),
        StructField("item", StringType()),
    ]
)

_BD_STATE = StructType(
    [
        StructField("bits", ArrayType(LongType())),
        StructField("n_inserted", LongType()),
        StructField("seq", LongType()),
    ]
)


def _bloom_pos_py(j: int, item: str, n_bits: int) -> int:
    """The plans/sampling bloom hash in Python: portable 60-bit md5 of
    'j:item' mod n_bits (same contract as bloom_build/bloom_hit)."""
    return int(hashlib.md5(f"{j}:{item}".encode()).hexdigest()[:15], 16) % n_bits


class StreamingBloomDedup(StatefulTransformer):
    """FULL-HISTORY approximate dedup with CONSTANT per-key state — the
    complement of ``streaming_dedup_exact``: the watermark variant is
    exact but forgets past the horizon (a duplicate a week later slips
    through); this one never forgets and never emits a true duplicate
    (Bloom one-sidedness: once inserted, an item always probes positive),
    at the price of occasionally SUPPRESSING a novel item whose bits all
    collide (rate ~ (k*n/m)^k, deterministic — same md5 contract as
    ``plans.sampling.bloom_build``). State is m/64 longs per key, however
    long the stream runs.

    Per micro-batch: distinct batch items probe in sorted order
    (deterministic under any row order); negatives emit ``(seq, item)``
    and insert. Emissions are always duplicate-free; at a sizing where no
    false positive fires, the emitted set equals the exact distinct set
    under ANY chunking (and equals a one-fold batch call). When false
    positives do fire, WHICH novel item is suppressed depends on insertion
    order and hence on chunk boundaries — deterministic for a given
    chunking, not chunking-invariant."""

    _defaults = {
        "nBits": 1 << 16,
        "nHashes": 4,
        "itemCol": "item",
    }

    def setNBits(self, value):
        return self._set("nBits", int(value))

    def setNHashes(self, value):
        return self._set("nHashes", int(value))

    def setItemCol(self, value):
        return self._set("itemCol", value)

    def _constants(self):
        return {"n_bits": int(self.get("nBits")), "k": int(self.get("nHashes"))}

    def _inputCols(self, df):
        return [("item", F.col(self.get("itemCol")).cast("string"))]

    def _outSchema(self):
        return _BD_OUT

    def _stateSchema(self):
        return _BD_STATE

    def _foldFactory(self):
        def factory(c):
            n_bits, k = c["n_bits"], c["k"]
            n_words = (n_bits + 63) // 64

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _BD_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                if state is None:
                    bits = np.zeros(n_words, dtype=np.uint64)
                    n_inserted, seq = 0, 0
                else:
                    bits = np.asarray(state["bits"], dtype=np.int64).view(np.uint64)
                    n_inserted, seq = state["n_inserted"], state["seq"]
                seq += 1
                emitted = []
                for item in sorted(pdf["item"].dropna().unique()):
                    pos = [_bloom_pos_py(j, item, n_bits) for j in range(k)]
                    seen = all(
                        bits[p >> 6] & np.uint64(1 << (p & 63)) for p in pos
                    )
                    if not seen:
                        emitted.append(item)
                        n_inserted += 1
                        for p in pos:
                            bits[p >> 6] |= np.uint64(1 << (p & 63))
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(emitted),
                        "seq": [seq] * len(emitted),
                        "item": emitted,
                    },
                    columns=names,
                )
                state = {
                    "bits": bits.view(np.int64).tolist(),
                    "n_inserted": n_inserted,
                    "seq": seq,
                }
                return out, state

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["bits"], state["n_inserted"], state["seq"])

    @staticmethod
    def _unpackState(packed):
        return {"bits": list(packed[0]), "n_inserted": packed[1], "seq": packed[2]}
