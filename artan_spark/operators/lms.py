"""Normalized least mean squares filter.

Parity: /root/reference/src/main/scala/com/github/ozancicek/artan/ml/filter/
LeastMeanSquaresFilter.scala:53-224 (update :171-190; defaults learningRate=1.0,
regularizationConstant=1.0 :201,213). State is a plain vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from artan_spark import linalg
from artan_spark.operators.base import EVENT_TIME, STATE_KEY, StatefulTransformer
from artan_spark.types import (
    VECTOR,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    np_to_vec,
    vec_to_np,
)

_OUT_SCHEMA = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("stateIndex", LongType()),
        StructField("state", VECTOR),
        StructField(EVENT_TIME, TimestampType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("stateIndex", LongType()),
        StructField("mean", VECTOR),
    ]
)


def _lms_fold_factory(c: dict):
    lr, reg = c["learningRate"], c["regularizationConstant"]

    def fold(pdf: pd.DataFrame, state):
        key = pdf[STATE_KEY].iloc[0] if len(pdf) else ""
        labels = pdf["label"].values
        feats = pdf["features"].values
        ev = pdf[EVENT_TIME].values if EVENT_TIME in pdf.columns else None
        init_col = pdf["initialState"].values if "initialState" in pdf.columns else None

        out = {f.name: [] for f in _OUT_SCHEMA.fields}
        for i in range(len(pdf)):
            if state is None:
                mean = c["initialState"]
                if init_col is not None and init_col[i] is not None:
                    mean = vec_to_np(init_col[i])
                if mean is None:
                    mean = np.zeros(len(vec_to_np(feats[i])))
                state = {"idx": 0, "mean": np.asarray(mean, dtype=np.float64).ravel()}
            x = vec_to_np(feats[i])
            state["mean"] = linalg.lms_update(state["mean"], float(labels[i]), x, lr, reg)
            state["idx"] += 1
            out[STATE_KEY].append(key)
            out["stateIndex"].append(state["idx"])
            out["state"].append(np_to_vec(state["mean"]))
            out[EVENT_TIME].append(ev[i] if ev is not None else None)
        return pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields]), state

    return fold


class LeastMeanSquaresFilter(StatefulTransformer):
    _defaults = {
        "labelCol": "label",
        "featuresCol": "features",
        "learningRate": 1.0,
        "regularizationConstant": 1.0,
        "initialState": None,
        "initialStateCol": None,
        "vectorizedBatch": False,
        "vectorizedBuckets": None,
        # "auto" (default): 1-D affine scan in batch mode when the shape is
        # provably scalar (initialState of length 1; ~1e-12 parity) |
        # "sequential" (bit-exact, the escape hatch; also when initialState
        # is None — the feature dim is unknowable before the data) |
        # "scan" (force; requires vectorizedBatch) | "distributedScan"
        # (cross-TASK two-pass scan, operators/distscan.py: a hot key spans
        # #chunks tasks; provably-1-D shape + eventTimeCol)
        "foldEngine": "auto",
        "scanChunkDuration": "1 hour",
        "distributedScanMaxGroups": 200_000,
    }

    def setInitialEstimate(self, value):
        return self._set("initialState", np.asarray(value, dtype=np.float64))

    def transform(self, df):
        engine = self.get("foldEngine")
        if engine in ("scan", "distributedScan") and (
            df.isStreaming or not self.get("vectorizedBatch")
        ):
            raise ValueError(
                f"foldEngine={engine!r} is a batch vectorized engine: call "
                "setVectorizedBatch(True) and use batch input"
            )
        if engine == "distributedScan":
            from artan_spark.operators.distscan import distributed_lms_transform

            self._lastFoldEngine = engine  # introspection (tests/bench)
            return distributed_lms_transform(self, df)
        if engine == "auto":
            init = self.get("initialState")
            scalar_known = init is not None and len(np.ravel(init)) == 1
            engine = (
                "scan"
                if (
                    not df.isStreaming
                    and scalar_known
                    and not self.get("initialStateCol")
                )
                else "sequential"
            )
        if (
            not df.isStreaming
            and not self.get("initialStateCol")
            and (engine == "scan" or self.get("vectorizedBatch"))
        ):
            self._lastFoldEngine = engine  # introspection (tests/bench)
            return self._vectorizedTransform(df, engine)
        self._lastFoldEngine = "sequential"
        return super().transform(df)

    def _vectorizedTransform(self, df, engine: str = "sequential"):
        """Salted multi-key grouped fold, time-synchronous across keys
        (operators/vectorized.py vectorized_lms_fold_factory). Batch only.
        The fold already emits the public (state VECTOR) schema — no
        JVM-side reassembly needed."""
        from artan_spark.operators.vectorized import (
            vectorized_lms_fold_factory,
            vectorized_scalar_lms_scan_fold_factory,
        )

        keyed = self._keyed(df)
        constants = self._constants()
        if engine == "scan":
            init = constants["initialState"]
            feat_1d = init is None or len(np.ravel(init)) == 1
            if not feat_1d:
                raise ValueError(
                    "foldEngine='scan' supports the 1-D LMS shape only — "
                    "use the sequential engine for n-D feature vectors"
                )
            factory = vectorized_scalar_lms_scan_fold_factory
        else:
            factory = vectorized_lms_fold_factory
        factory_cell: list = []

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if not factory_cell:
                factory_cell.append(factory(constants))
            cols = [STATE_KEY] + ([EVENT_TIME] if EVENT_TIME in pdf.columns else [])
            pdf = pdf.sort_values(cols, kind="stable", na_position="first")
            out, _ = factory_cell[0](pdf, None)
            return out

        salted = self._saltedKeys(df, keyed)
        res = salted.groupBy("__salt__").applyInPandas(fn, _OUT_SCHEMA)
        return res if self.get("eventTimeCol") else res.drop(EVENT_TIME)

    def _constants(self):
        init = self.get("initialState")
        return {
            "learningRate": float(self.get("learningRate")),
            "regularizationConstant": float(self.get("regularizationConstant")),
            "initialState": None if init is None else np.asarray(init, dtype=np.float64).ravel(),
        }

    def _inputCols(self, df):
        from artan_spark.functions import auto_array

        cols = [
            ("label", F.col(self.get("labelCol")).cast("double")),
            ("features", auto_array(df, self.get("featuresCol"))),
        ]
        if self.get("initialStateCol"):
            cols.append(("initialState", auto_array(df, self.get("initialStateCol"))))
        return cols

    def _outSchema(self):
        return _OUT_SCHEMA

    def _stateSchema(self):
        return _STATE_SCHEMA

    def _foldFactory(self):
        return _lms_fold_factory

    @staticmethod
    def _packState(state):
        return (int(state["idx"]), state["mean"].tolist())

    @staticmethod
    def _unpackState(packed):
        idx, mean = packed
        return {"idx": int(idx), "mean": np.asarray(mean, dtype=np.float64)}

    def _shapeOutput(self, df):
        return df if self.get("eventTimeCol") else df.drop(EVENT_TIME)
