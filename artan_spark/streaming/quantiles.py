"""Streaming quantiles: a mergeable rank summary as keyed state.

The batch sketch (plans/sketch.py ``events_quantile_sketch``) folds each
partition into a bounded (value, weight) summary with CUM-PRESERVING
compaction; under Structured Streaming the same summary lives as per-key
state and folds each micro-batch's arrivals into it, so a live stream
answers "quantiles of everything seen so far" with O(capacity) state per
key and an explicit rank-error certificate — the quantile sibling of
``StreamingHeavyHitters``.

Per micro-batch: arrivals append with weight 1; past ``4*capacity`` points
the summary compacts by sampling at cum-weight steps, which keeps every
kept point's cumulative weight (= its exact upper rank among everything
folded so far) intact — compaction only widens the GAP to the previous
kept point, and ``err_bound = max_gap - 1`` is carried in the output.
After folding, the operator emits one row per requested quantile:
``(seq, q, est, n, err_bound)`` where ``est`` is the first summary point
whose cumulative weight reaches ``ceil(q*n)``; its true rank is within
``err_bound`` of that target. With ``capacity`` at least the key's row
count nothing compacts, the certificate is 0, and any chunking of the
stream yields the same final snapshot as one batch fold — asserted
row-for-row in tests/test_heavy_hitters.py.
"""

from __future__ import annotations

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

_QS_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("seq", LongType()),
        StructField("q", DoubleType()),
        StructField("est", DoubleType()),
        StructField("n", LongType()),
        StructField("err_bound", LongType()),
    ]
)

_QS_STATE = StructType(
    [
        StructField("vals", ArrayType(DoubleType())),
        StructField("wts", ArrayType(LongType())),
        StructField("seq", LongType()),
    ]
)


def _compress(vals: np.ndarray, wts: np.ndarray, capacity: int):
    """Cum-preserving compaction to <= capacity points: kept points'
    cumulative weights equal their original cumulative weights, so upper
    ranks stay exact through any number of rounds."""
    order = np.argsort(vals, kind="mergesort")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = int(cum[-1])
    step = -(-total // capacity)
    targets = np.append(np.arange(step, total, step), total)
    idx = np.unique(np.searchsorted(cum, targets, side="left"))
    new_cum = cum[idx]
    return vals[idx], np.diff(np.concatenate(([0], new_cum)))


class StreamingQuantiles(StatefulTransformer):
    """Keyed streaming quantiles with bounded mergeable-summary state."""

    _defaults = {
        "capacity": 4096,
        "quantiles": (0.25, 0.5, 0.9),
        "valueCol": "value",
    }

    def setCapacity(self, value):
        cap = int(value)
        if cap <= 0:
            raise ValueError(f"capacity must be > 0, got {cap}")
        return self._set("capacity", cap)

    def setQuantiles(self, value):
        qs = tuple(float(q) for q in value)
        if not qs or any(not (0.0 < q <= 1.0) for q in qs):
            raise ValueError(f"quantiles must be in (0, 1], got {qs}")
        return self._set("quantiles", qs)

    def setValueCol(self, value):
        return self._set("valueCol", value)

    def _constants(self):
        return {
            "capacity": int(self.get("capacity")),
            "quantiles": tuple(self.get("quantiles")),
        }

    def _inputCols(self, df):
        return [("value", F.col(self.get("valueCol")).cast("double"))]

    def _outSchema(self):
        return _QS_OUT

    def _stateSchema(self):
        return _QS_STATE

    def _foldFactory(self):
        def factory(c):
            capacity, quantiles = c["capacity"], c["quantiles"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _QS_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                if state is None:
                    vals = np.array([], dtype=np.float64)
                    wts = np.array([], dtype=np.int64)
                    seq = 0
                else:
                    vals = np.asarray(state["vals"], dtype=np.float64)
                    wts = np.asarray(state["wts"], dtype=np.int64)
                    seq = state["seq"]
                v = np.concatenate([vals, pdf["value"].to_numpy(dtype=np.float64)])
                w = np.concatenate([wts, np.ones(len(pdf), dtype=np.int64)])
                if len(v) > 4 * capacity:
                    v, w = _compress(v, w, capacity)
                seq += 1

                order = np.argsort(v, kind="mergesort")
                sv, sw = v[order], w[order]
                cum = np.cumsum(sw)
                n = int(cum[-1])
                err = int(sw.max()) - 1
                qs, ests = [], []
                for q in quantiles:
                    r = math.ceil(q * n)
                    qs.append(q)
                    ests.append(float(sv[np.searchsorted(cum, r, side="left")]))
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(qs),
                        "seq": [seq] * len(qs),
                        "q": qs,
                        "est": ests,
                        "n": [n] * len(qs),
                        "err_bound": [err] * len(qs),
                    },
                    columns=names,
                )
                # plain Python scalars: the streaming state pickler rejects
                # numpy float64/int64 objects
                state = {"vals": [float(x) for x in v], "wts": [int(x) for x in w], "seq": seq}
                return out, state

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["vals"], state["wts"], state["seq"])

    @staticmethod
    def _unpackState(packed):
        return {"vals": list(packed[0]), "wts": list(packed[1]), "seq": packed[2]}
