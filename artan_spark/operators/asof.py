"""Streaming as-of join as a keyed stateful operator.

The batch formulation (plans/temporal.py ``asof_join``) is a window over a
union — fine for bounded data, unavailable under Structured Streaming's
append mode. This operator re-expresses the same semantics as a keyed
ordered fold on the shared StatefulTransformer machinery (one
``applyInPandasWithState`` per key, state = the latest right-side row), so
an as-of feature attach can run on a live stream with watermark-bounded
state: O(1) state per key regardless of stream length.

Input contract: one unioned frame with a ``side`` column (0 = right/build
rows, 1 = left/probe rows) and a ``payload`` array column (the right row's
attachable values; left rows carry their own payload through). Right rows
sort before left rows at equal event time, so a right row at exactly the
probe's timestamp is visible to it — identical tie semantics to the batch
window version and DuckDB's ASOF JOIN (tests assert all three agree).
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
    TimestampType,
)

_OUT_SCHEMA = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField(EVENT_TIME, TimestampType(), True),
        StructField("payload", ArrayType(DoubleType()), True),
        StructField("asofPayload", ArrayType(DoubleType()), True),
        StructField("asofTime", TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("payload", ArrayType(DoubleType()), True),
        StructField("micros", LongType(), True),
    ]
)


def _asof_fold_factory(c: dict):
    def fold(pdf: pd.DataFrame, state):
        names = [f.name for f in _OUT_SCHEMA.fields]
        if len(pdf) == 0:
            return empty_pdf(names), state
        # base sorts by event time only; right-before-left at equal ts makes
        # the match inclusive (same tiebreak as the batch window's __side__)
        pdf = pdf.sort_values([EVENT_TIME, "side"], kind="stable", na_position="first")
        key = pdf[STATE_KEY].iloc[0]
        side = pdf["side"].to_numpy()
        pay = pdf["payload"].to_numpy()
        ev = pdf[EVENT_TIME].to_numpy()

        ridx = np.where(side == 0, np.arange(len(pdf)), -1)
        last_right = np.maximum.accumulate(ridx)

        # stored state is usable for a probe only when it does not come from
        # the probe's future — a late probe the watermark admits must NOT
        # attach a newer build row (as-of contract: build.ts <= probe.ts)
        has_state = state is not None and state["ts"] is not None

        lpos = np.nonzero(side == 1)[0]
        asof_pay, asof_ts = [], []
        for i in lpos:
            j = last_right[i]
            cand_pay = pay[j] if j >= 0 else None
            cand_ts = ev[j] if j >= 0 else None
            if has_state and state["ts"] <= ev[i] and (cand_ts is None or state["ts"] > cand_ts):
                # stored build row is admissible and later than any in-batch
                # build row at or before the probe (in-batch rows can be
                # late relative to previously stored state)
                cand_pay, cand_ts = state["payload"], state["ts"]
            asof_pay.append(cand_pay)
            asof_ts.append(cand_ts)

        rpos = np.nonzero(side == 0)[0]
        if len(rpos) and (not has_state or ev[rpos[-1]] >= state["ts"]):
            # keep max-ts build row: a whole batch of late build rows must
            # not regress the stored state (batch wins ties, matching the
            # right-before-left in-batch ordering)
            state = {"payload": pay[rpos[-1]], "ts": ev[rpos[-1]]}
        elif state is None:
            # keep an explicit empty state: the streaming wrapper packs the
            # returned state unconditionally
            state = {"payload": None, "ts": None}

        out = pd.DataFrame(
            {
                STATE_KEY: [key] * len(lpos),
                EVENT_TIME: ev[lpos],
                "payload": pay[lpos],
                "asofPayload": asof_pay,
                "asofTime": asof_ts,
            },
            columns=names,
        )
        return out, state

    return fold


class StreamingAsofJoin(StatefulTransformer):
    """Keyed as-of attach over a side-tagged union of probe and build rows."""

    _defaults = {
        "sideCol": "side",
        "payloadCol": "payload",
    }

    def setSideCol(self, value):
        return self._set("sideCol", value)

    def setPayloadCol(self, value):
        return self._set("payloadCol", value)

    def _constants(self):
        return {}

    def _inputCols(self, df):
        from artan_spark.functions import auto_array

        return [
            ("side", F.col(self.get("sideCol")).cast("int")),
            ("payload", auto_array(df, self.get("payloadCol"))),
        ]

    def _outSchema(self):
        return _OUT_SCHEMA

    def _stateSchema(self):
        return _STATE_SCHEMA

    def _foldFactory(self):
        return _asof_fold_factory

    @staticmethod
    def _packState(state):
        p = state["payload"]
        ts = state["ts"]
        micros = None if ts is None else int(np.datetime64(ts, "us").astype("int64"))
        return (None if p is None else [float(v) for v in p], micros)

    @staticmethod
    def _unpackState(packed):
        p, micros = packed
        return {
            "payload": None if p is None else np.asarray(p, dtype=np.float64),
            "ts": None if micros is None else np.datetime64(int(micros), "us"),
        }
