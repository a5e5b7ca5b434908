"""Streaming funnel: per-user strict-order step progress as keyed state.

The batch funnel (plans/relational.py ``events_funnel``) answers "how many
users completed each prefix" with three conditioned min-aggs; under
Structured Streaming the same semantics live as per-key state — the FIRST
qualifying timestamp of each completed step — so a live stream emits a row
the moment a user advances, with O(n_steps) state per user forever.

Semantics: a step completes at the first event of its type with
``ts > previous step's completion ts`` (strict order, the batch
definition). Rows fold in event-time order per micro-batch (the shared
``StatefulTransformer`` sort); cross-batch late events older than an
already-completed step cannot retroactively re-order it — the upstream
watermark owns lateness, same contract as the estimation operators. On a
stream fed in event-time order, the final per-user completions equal the
batch query's per-user (t1, t2, t3) row-for-row (asserted in tests).
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
    TimestampType,
)

_FN_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("step", LongType()),
        StructField("step_name", StringType()),
        StructField("ts", TimestampType()),
    ]
)

_FN_STATE = StructType(
    [
        StructField("done_us", ArrayType(LongType())),  # epoch-us per completed step
    ]
)


class StreamingFunnel(StatefulTransformer):
    """Keyed strict-order funnel progress; emits one row per newly
    completed step."""

    _defaults = {
        "steps": ("view", "click", "purchase"),
        "typeCol": "event_type",
    }

    def setSteps(self, value):
        return self._set("steps", tuple(value))

    def setTypeCol(self, value):
        return self._set("typeCol", value)

    def _constants(self):
        return {"steps": tuple(self.get("steps"))}

    def _inputCols(self, df):
        return [("etype", F.col(self.get("typeCol")).cast("string"))]

    def _outSchema(self):
        return _FN_OUT

    def _stateSchema(self):
        return _FN_STATE

    def _foldFactory(self):
        def factory(c):
            steps = c["steps"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _FN_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                done = list(state["done_us"]) if state is not None else []
                out_steps, out_names, out_ts = [], [], []
                # rows arrive event-time sorted (base sort_group); ties on
                # ts cannot advance a strict (>) funnel anyway
                ev = pdf["eventTime"]
                for etype, ts in zip(pdf["etype"], ev):
                    if len(done) >= len(steps):
                        break
                    nxt = steps[len(done)]
                    if etype != nxt or pd.isna(ts):
                        continue
                    ts_us = int(pd.Timestamp(ts).value // 1000)
                    if done and not ts_us > done[-1]:
                        continue
                    done.append(ts_us)
                    out_steps.append(len(done))
                    out_names.append(nxt)
                    out_ts.append(pd.Timestamp(ts_us * 1000))
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(out_steps),
                        "step": np.asarray(out_steps, dtype=np.int64),
                        "step_name": out_names,
                        "ts": out_ts,
                    },
                    columns=names,
                )
                return out, {"done_us": done}

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["done_us"],)

    @staticmethod
    def _unpackState(packed):
        return {"done_us": list(packed[0])}
