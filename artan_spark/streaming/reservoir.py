"""Streaming weighted reservoir sampling: a bounded A-ES top-k as keyed
state.

The batch sampler (plans/sampling.py ``docs_weighted_sample``) is the
Efraimidis-Spirakis scheme: priority ``ln(u)/w`` with the hash-uniform
``u`` derived from the item id, keep the k LARGEST priorities — sample
probability proportional to weight, without replacement, deterministic.
Because the priority is a pure function of the item (not of arrival
order), the top-k of a stream is CHUNKING-INVARIANT: fold any prefix in
any batching and the final reservoir equals the batch query's answer
row-for-row — asserted against ``docs_weighted_sample`` in tests. State
is k (priority, item, weight) triples per key, however long the stream
runs.

Per micro-batch the fold pre-reduces with a vectorized priority
computation, merges into the running top-k, and EMITS the current
reservoir snapshot as ``(seq, rank, item, weight)`` rows — downstream
consumers (and the tests) select the latest ``seq``.

Cross-engine note: ``ln`` here is C libm, the batch side is JVM
``Math.log`` — both within 1 ulp, and priorities are distinct random
doubles with gaps astronomically wider than 1e-16 relative, so membership
and order cannot flip (the same argument ``docs_weighted_sample`` makes
for its DuckDB oracle).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from artan_spark.operators.base import STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_RS_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("seq", LongType()),
        StructField("rank", LongType()),
        StructField("item", StringType()),
        StructField("weight", DoubleType()),
    ]
)

_RS_STATE = StructType(
    [
        StructField("prios", ArrayType(DoubleType())),
        StructField("items", ArrayType(StringType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("seq", LongType()),
    ]
)

_TWO60 = float(1 << 60)


def _priority(item: str, weight: float) -> float:
    """ln(u)/w with the portable 60-bit md5 hash-uniform — the exact
    construction of ``plans.sampling.docs_weighted_sample``."""
    u = (int(hashlib.md5(item.encode()).hexdigest()[:15], 16) + 0.5) / _TWO60
    return math.log(u) / weight


class StreamingWeightedReservoir(StatefulTransformer):
    """Keyed streaming A-ES: weight-proportional sample without
    replacement, k items per key, O(k) state."""

    _defaults = {
        "k": 50,
        "itemCol": "item",
        "weightCol": "weight",
    }

    def setK(self, value):
        return self._set("k", int(value))

    def setItemCol(self, value):
        return self._set("itemCol", value)

    def setWeightCol(self, value):
        return self._set("weightCol", value)

    def _constants(self):
        return {"k": int(self.get("k"))}

    def _inputCols(self, df):
        return [
            ("item", F.col(self.get("itemCol")).cast("string")),
            ("weight", F.col(self.get("weightCol")).cast("double")),
        ]

    def _outSchema(self):
        return _RS_OUT

    def _stateSchema(self):
        return _RS_STATE

    def _foldFactory(self):
        def factory(c):
            k = c["k"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _RS_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                if state is None:
                    entries, seq = {}, 0
                else:
                    entries = {
                        i: (p, w)
                        for p, i, w in zip(state["prios"], state["items"], state["weights"])
                    }
                    seq = state["seq"]
                # duplicate arrivals of an item are idempotent (same
                # priority); positive weights only — the scheme is
                # undefined at w <= 0, drop those rows loudly upstream
                batch = pdf[["item", "weight"]].dropna().drop_duplicates("item")
                for item, w in batch.itertuples(index=False):
                    if item not in entries and w > 0:
                        entries[item] = (_priority(item, float(w)), float(w))
                if len(entries) > k:
                    top = sorted(entries.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
                    entries = dict(top)
                seq += 1
                snap = sorted(entries.items(), key=lambda kv: (-kv[1][0], kv[0]))
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(snap),
                        "seq": [seq] * len(snap),
                        "rank": np.arange(1, len(snap) + 1, dtype=np.int64),
                        "item": [i for i, _ in snap],
                        "weight": [pw[1] for _, pw in snap],
                    },
                    columns=names,
                )
                state = {
                    "prios": [pw[0] for _, pw in snap],
                    "items": [i for i, _ in snap],
                    "weights": [pw[1] for _, pw in snap],
                    "seq": seq,
                }
                return out, state

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["prios"], state["items"], state["weights"], state["seq"])

    @staticmethod
    def _unpackState(packed):
        return {
            "prios": list(packed[0]),
            "items": list(packed[1]),
            "weights": list(packed[2]),
            "seq": packed[3],
        }
