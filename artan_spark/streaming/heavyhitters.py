"""Streaming heavy hitters: a weighted Misra-Gries summary as keyed state.

The batch sketch (plans/sketch.py ``events_heavy_hitters``) folds each
PARTITION into a bounded counter table and merges once; under Structured
Streaming the same summary lives as per-key state and folds each
micro-batch's arrivals into it, so a live stream answers "top-k heaviest
items so far" with O(capacity) state per key and an explicit error
certificate — no unbounded per-item state, no full shuffle per trigger.

Semantics per micro-batch: batch items are pre-reduced by a vectorized
``value_counts`` and folded into the counters in sorted item order (the
deterministic weighted-MG step: overflow subtracts the minimum counter from
all). After folding, the operator EMITS the current top-k as
``(seq, rank, item, est, err_bound)`` rows — ``seq`` increments per
emission, so downstream consumers (and the batch≡stream tests) select the
latest snapshot; ``est`` obeys ``f - err_bound <= est <= f`` against the
true count ``f`` of everything folded so far. With ``capacity`` at least
the key's distinct-item count no decrement ever fires, the certificate is
0, and any chunking of the stream yields the same final snapshot as one
batch fold — asserted row-for-row in tests/test_heavy_hitters.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from artan_spark.operators.base import STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_HH_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("seq", LongType()),
        StructField("rank", LongType()),
        StructField("item", StringType()),
        StructField("est", LongType()),
        StructField("err_bound", LongType()),
    ]
)

_HH_STATE = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("dec", LongType()),
        StructField("seq", LongType()),
    ]
)


class StreamingHeavyHitters(StatefulTransformer):
    """Keyed streaming top-k with bounded Misra-Gries state."""

    _defaults = {
        "capacity": 256,
        "k": 10,
        "itemCol": "item",
    }

    def setCapacity(self, value):
        return self._set("capacity", int(value))

    def setK(self, value):
        return self._set("k", int(value))

    def setItemCol(self, value):
        return self._set("itemCol", value)

    def _constants(self):
        return {"capacity": int(self.get("capacity")), "k": int(self.get("k"))}

    def _inputCols(self, df):
        return [("item", F.col(self.get("itemCol")).cast("string"))]

    def _outSchema(self):
        return _HH_OUT

    def _stateSchema(self):
        return _HH_STATE

    def _foldFactory(self):
        def factory(c):
            capacity, k = c["capacity"], c["k"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _HH_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                if state is None:
                    counters, dec_total, seq = {}, 0, 0
                else:
                    counters = dict(zip(state["items"], state["counts"]))
                    dec_total, seq = state["dec"], state["seq"]
                # vectorized batch reduction; sorted item order makes the
                # fold deterministic under any row order within the batch
                vc = pdf["item"].value_counts()
                for item in sorted(vc.index):
                    w = int(vc[item])
                    if item in counters:
                        counters[item] += w
                        continue
                    counters[item] = w
                    if len(counters) > capacity:
                        m = min(counters.values())
                        dec_total += m
                        counters = {i: n - m for i, n in counters.items() if n > m}
                seq += 1
                top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(top),
                        "seq": [seq] * len(top),
                        "rank": np.arange(1, len(top) + 1, dtype=np.int64),
                        "item": [i for i, _ in top],
                        "est": [n for _, n in top],
                        "err_bound": [dec_total] * len(top),
                    },
                    columns=names,
                )
                state = {
                    "items": list(counters.keys()),
                    "counts": list(counters.values()),
                    "dec": dec_total,
                    "seq": seq,
                }
                return out, state

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["items"], state["counts"], state["dec"], state["seq"])

    @staticmethod
    def _unpackState(packed):
        return {"items": list(packed[0]), "counts": list(packed[1]), "dec": packed[2], "seq": packed[3]}
