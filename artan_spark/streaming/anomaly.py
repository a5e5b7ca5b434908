"""Streaming rolling z-score anomaly scoring.

The streaming counterpart of ``plans/temporal.rolling_zscore``: the trailing
``window`` values per key live as keyed state (a bounded ring tail), each
arriving event is scored against the baseline it joins AFTER scoring, and
warm-up / zero-variance semantics match the batch operator exactly.

Chunk invariance is BIT-exact by construction: every score is recomputed
from the identical trailing value array whichever micro-batch boundaries the
stream arrived through (no incremental accumulator carries float error
across batches — with window <= a few hundred, exact recompute is cheaper
than the bookkeeping that would make an incremental path safe).

State is O(window) doubles per key however long the stream runs; with an
event-time watermark + timeout the key set itself is bounded too, the same
knobs as every operator on StatefulTransformer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from artan_spark.operators.base import EVENT_TIME, STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_AZ_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("n_baseline", LongType()),
        StructField("z", DoubleType()),
    ]
)

_AZ_STATE = StructType([StructField("buf", ArrayType(DoubleType()))])


class StreamingRollingZScore(StatefulTransformer):
    """Keyed streaming z-scores against a trailing-window baseline
    (batch+stream; same defaults as ``plans/temporal.rolling_zscore``)."""

    _defaults = {
        "window": 20,
        "minN": 5,
        "valueCol": "value",
        "eventIdCol": "event_id",
    }

    def setWindow(self, value):
        w = int(value)
        if w <= 0:
            raise ValueError(f"window must be > 0, got {w}")
        return self._set("window", w)

    def setMinN(self, value):
        n = int(value)
        if n <= 0:
            raise ValueError(f"minN must be > 0, got {n}")
        return self._set("minN", n)

    def setValueCol(self, value):
        return self._set("valueCol", value)

    def setEventIdCol(self, value):
        return self._set("eventIdCol", value)

    def _constants(self):
        return {"window": int(self.get("window")), "min_n": int(self.get("minN"))}

    def _inputCols(self, df):
        return [
            ("value", F.col(self.get("valueCol")).cast("double")),
            ("event_id", F.col(self.get("eventIdCol")).cast("long")),
        ]

    def _outSchema(self):
        return _AZ_OUT

    def _stateSchema(self):
        return _AZ_STATE

    def _foldFactory(self):
        def factory(c):
            window, min_n = c["window"], c["min_n"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _AZ_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                # deterministic tie order inside the micro-batch (the base
                # sorts by event time only, stable on arrival order)
                if EVENT_TIME in pdf.columns and pdf[EVENT_TIME].notna().any():
                    pdf = pdf.sort_values(
                        [EVENT_TIME, "event_id"], kind="stable", na_position="first"
                    )
                key = pdf[STATE_KEY].iloc[0]
                buf = [] if state is None else list(state["buf"])
                vals = pdf["value"].to_numpy(dtype=np.float64)
                arr = np.concatenate([np.asarray(buf, dtype=np.float64), vals])
                start = len(buf)
                ns, zs = [], []
                for i in range(start, len(arr)):
                    win = arr[max(0, i - window) : i]
                    n = len(win)
                    ns.append(n)
                    if n < min_n:
                        zs.append(None)
                        continue
                    sd = float(win.std(ddof=1))
                    zs.append(float((arr[i] - win.mean()) / sd) if sd > 0.0 else None)
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(vals),
                        "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                        "value": vals,
                        "n_baseline": np.asarray(ns, dtype=np.int64),
                        "z": pd.array(zs, dtype="Float64"),
                    },
                    columns=names,
                )
                # keep only the rows a baseline could score (match batch:
                # warm-up rows below min_n emit nothing)
                out = out[out["n_baseline"] >= min_n]
                tail = [float(x) for x in arr[-window:]]
                return out, {"buf": tail}

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["buf"],)

    @staticmethod
    def _unpackState(packed):
        return {"buf": list(packed[0])}
