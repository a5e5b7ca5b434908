"""Streaming Count-Min Sketch: a fixed depth x width counter grid as keyed
state.

The batch sketch (plans/sketch.py ``cms_build``/``cms_estimate``) folds the
corpus into depth*width cells with one partial agg; under Structured
Streaming the same grid lives as per-key state and each micro-batch's
arrivals fold into it, so a live stream answers "how often has item X
occurred so far" with O(depth*width) state per key — no per-item state, no
growth with cardinality.

Hash contract: column j of item x is the SAME portable 60-bit md5 of
``f"{j}:{x}"`` (mod width) the batch sketch and its DuckDB oracle use, so a
stream folded in any chunking yields the exact cell grid of one batch build
— asserted cell-for-cell and estimate-for-estimate in
tests/test_heavy_hitters.py.

Semantics per micro-batch: items pre-reduced by a vectorized
``value_counts``, counts added to each of the ``depth`` hashed cells, then
the operator EMITS ``(seq, item, est)`` for the batch's DISTINCT items —
``est`` is the post-fold Count-Min estimate (min over rows), which obeys
``est >= true count so far`` always (the CMS one-sided certificate).
"""

from __future__ import annotations

import hashlib

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

_CMS_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("seq", LongType()),
        StructField("item", StringType()),
        StructField("est", LongType()),
    ]
)

_CMS_STATE = StructType(
    [
        StructField("cells", ArrayType(LongType())),
        StructField("seq", LongType()),
    ]
)


def _cms_col_py(j: int, item: str, width: int) -> int:
    """The batch `_cms_col` hash in Python: portable 60-bit md5 of
    'j:item' mod width (md5 hex first 15 chars as an integer — identical
    to Spark conv(substring(md5(x),1,15),16,10) and the DuckDB oracle)."""
    return int(hashlib.md5(f"{j}:{item}".encode()).hexdigest()[:15], 16) % width


class StreamingCountMin(StatefulTransformer):
    """Keyed streaming frequency sketch with a bounded counter grid."""

    _defaults = {
        "depth": 4,
        "width": 256,
        "itemCol": "item",
    }

    def setDepth(self, value):
        return self._set("depth", int(value))

    def setWidth(self, value):
        return self._set("width", int(value))

    def setItemCol(self, value):
        return self._set("itemCol", value)

    def _constants(self):
        return {"depth": int(self.get("depth")), "width": int(self.get("width"))}

    def _inputCols(self, df):
        return [("item", F.col(self.get("itemCol")).cast("string"))]

    def _outSchema(self):
        return _CMS_OUT

    def _stateSchema(self):
        return _CMS_STATE

    def _foldFactory(self):
        def factory(c):
            depth, width = c["depth"], c["width"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _CMS_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                if state is None:
                    cells = np.zeros(depth * width, dtype=np.int64)
                    seq = 0
                else:
                    cells = np.asarray(state["cells"], dtype=np.int64)
                    seq = state["seq"]
                vc = pdf["item"].value_counts()
                items = sorted(vc.index)
                for item in items:
                    w = int(vc[item])
                    for j in range(depth):
                        cells[j * width + _cms_col_py(j, item, width)] += w
                seq += 1
                ests = [
                    int(min(cells[j * width + _cms_col_py(j, item, width)] for j in range(depth)))
                    for item in items
                ]
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(items),
                        "seq": [seq] * len(items),
                        "item": items,
                        "est": ests,
                    },
                    columns=names,
                )
                state = {"cells": cells.tolist(), "seq": seq}
                return out, state

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["cells"], state["seq"])

    @staticmethod
    def _unpackState(packed):
        return {"cells": list(packed[0]), "seq": packed[1]}
