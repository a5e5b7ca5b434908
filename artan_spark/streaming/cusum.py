"""Streaming CUSUM drift alarms.

The live counterpart of ``plans/temporal.events_cusum_drift``: each keyed
event updates the two one-sided CUSUM statistics against a FROZEN per-key
baseline (mu, sd) the stream joins in upstream (stream-static join against
a persisted reference — the PSI-store serving discipline applied to CUSUM;
the batch operator's in-query mu/sd would be a moving target on a live
stream and defeat the point of drift detection).

    S_up_i   = max(0, S_up_{i-1}   + (x_i - mu - k*sd) / sd)
    S_down_i = max(0, S_down_{i-1} + (mu - k*sd - x_i) / sd)

State is TWO doubles per key. Chunk invariance is BIT-exact by
construction: the recursion's value depends only on the previous state and
the arriving value — identical float ops in identical order whatever the
micro-batch boundaries (nothing is recomputed, nothing approximated).
Rows with a missing/zero sd score as NULL and leave the state untouched,
matching the batch operator's try_divide semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from artan_spark.operators.base import EVENT_TIME, STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CU_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("cusum_up", DoubleType()),
        StructField("cusum_down", DoubleType()),
        StructField("alarm_up", BooleanType()),
        StructField("alarm_down", BooleanType()),
    ]
)

_CU_STATE = StructType(
    [StructField("su", DoubleType()), StructField("sd", DoubleType())]
)


class StreamingCusum(StatefulTransformer):
    """Keyed streaming CUSUM (batch+stream) against provided per-key
    baselines: input needs ``valueCol`` plus ``muCol``/``sigmaCol``
    (joined from a frozen reference). ``k`` is the slack in sigma units,
    ``h`` the alarm threshold (Page 1954 defaults k=0.5, h=5)."""

    _defaults = {
        "k": 0.5,
        "h": 5.0,
        "valueCol": "value",
        "muCol": "mu",
        "sigmaCol": "sigma",
        "eventIdCol": "event_id",
    }

    def setK(self, value):
        return self._set("k", float(value))

    def setH(self, value):
        h = float(value)
        if h <= 0:
            raise ValueError(f"h must be > 0, got {h}")
        return self._set("h", h)

    def setValueCol(self, value):
        return self._set("valueCol", value)

    def setMuCol(self, value):
        return self._set("muCol", value)

    def setSigmaCol(self, value):
        return self._set("sigmaCol", value)

    def setEventIdCol(self, value):
        return self._set("eventIdCol", value)

    def _constants(self):
        return {"k": float(self.get("k")), "h": float(self.get("h"))}

    def _inputCols(self, df):
        return [
            ("value", F.col(self.get("valueCol")).cast("double")),
            ("mu", F.col(self.get("muCol")).cast("double")),
            ("sigma", F.col(self.get("sigmaCol")).cast("double")),
            ("event_id", F.col(self.get("eventIdCol")).cast("long")),
        ]

    def _outSchema(self):
        return _CU_OUT

    def _stateSchema(self):
        return _CU_STATE

    def _foldFactory(self):
        def factory(c):
            k, h = c["k"], c["h"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _CU_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                if EVENT_TIME in pdf.columns and pdf[EVENT_TIME].notna().any():
                    pdf = pdf.sort_values(
                        [EVENT_TIME, "event_id"], kind="stable", na_position="first"
                    )
                key = pdf[STATE_KEY].iloc[0]
                su = 0.0 if state is None else float(state["su"])
                sdn = 0.0 if state is None else float(state["sd"])
                sus, sds = [], []
                for v, mu, sg in zip(pdf["value"], pdf["mu"], pdf["sigma"]):
                    if (
                        v is None
                        or mu is None
                        or sg is None
                        or (isinstance(sg, float) and (sg != sg or sg == 0.0))
                        or pd.isna(v)
                        or pd.isna(mu)
                        or pd.isna(sg)
                    ):
                        sus.append(None)
                        sds.append(None)
                        continue
                    su = max(0.0, su + (float(v) - float(mu) - k * float(sg)) / float(sg))
                    sdn = max(0.0, sdn + (float(mu) - k * float(sg) - float(v)) / float(sg))
                    sus.append(su)
                    sds.append(sdn)
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(pdf),
                        "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                        "value": pdf["value"].to_numpy(dtype=np.float64),
                        "cusum_up": pd.array(sus, dtype="Float64"),
                        "cusum_down": pd.array(sds, dtype="Float64"),
                        "alarm_up": pd.array(
                            [None if s is None else s >= h for s in sus], dtype="boolean"
                        ),
                        "alarm_down": pd.array(
                            [None if s is None else s >= h for s in sds], dtype="boolean"
                        ),
                    },
                    columns=names,
                )
                return out, {"su": su, "sd": sdn}

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["su"], state["sd"])

    @staticmethod
    def _unpackState(packed):
        return {"su": float(packed[0]), "sd": float(packed[1])}
