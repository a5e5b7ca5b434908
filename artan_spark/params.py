"""Lightweight chainable params with JSON persistence.

Plays the role of the reference's ``pyspark.ml.param`` mixin layer
(/root/reference/python/artan/state/stateful_transformer.py and
src/main/scala/.../filter/KalmanBase.scala:37-234) without Py4J: every
operator declares ``_defaults``; ``setFooBar(v)`` setters are synthesized;
``save``/``load`` round-trip params to JSON, cloudpickling callables —
the pure-Python analogue of the reference's base64 java-serialized function
params (FilterParams.scala:34-90).
"""

from __future__ import annotations

import base64
import json
import os
import pickle
from typing import Any

import numpy as np


def _encode(v: Any):
    if isinstance(v, np.ndarray):
        return {"__ndarray__": v.tolist(), "shape": list(v.shape)}
    if callable(v):
        return {"__pickled__": base64.b64encode(pickle.dumps(v)).decode("ascii")}
    if isinstance(v, (list, tuple)):
        return [_encode(x) for x in v]
    if isinstance(v, dict):
        return {k: _encode(x) for k, x in v.items()}
    return v


def _decode(v: Any):
    if isinstance(v, dict):
        if "__ndarray__" in v:
            return np.asarray(v["__ndarray__"], dtype=np.float64).reshape(v["shape"])
        if "__pickled__" in v:
            return pickle.loads(base64.b64decode(v["__pickled__"]))
        return {k: _decode(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode(x) for x in v]
    return v


def serialize_callable(fn):
    """Pickle a callable BY VALUE so Spark python workers don't need the
    defining module on their import path (the pure-Python analogue of the
    reference shipping serialized lambdas, FilterParams.scala:34-90)."""
    if fn is None:
        return None
    import sys

    import cloudpickle

    mod = sys.modules.get(getattr(fn, "__module__", None))
    if mod is not None and getattr(mod, "__name__", "__main__") != "__main__":
        try:
            cloudpickle.register_pickle_by_value(mod)
            try:
                return cloudpickle.dumps(fn)
            finally:
                cloudpickle.unregister_pickle_by_value(mod)
        except Exception:
            pass
    return cloudpickle.dumps(fn)


def deserialize_callable(payload):
    if payload is None or callable(payload):
        return payload
    import cloudpickle

    return cloudpickle.loads(payload)


class HasParams:
    """Base for all operators. Subclasses declare ``_defaults: dict``."""

    _defaults: dict[str, Any] = {}

    def __init__(self, **kwargs):
        self._paramMap: dict[str, Any] = dict(self._collectDefaults())
        for k, v in kwargs.items():
            self._set(k, v)

    @classmethod
    def _collectDefaults(cls) -> dict[str, Any]:
        merged: dict[str, Any] = {}
        for klass in reversed(cls.__mro__):
            merged.update(getattr(klass, "_defaults", {}) or {})
        return merged

    def _set(self, key: str, value: Any):
        if key not in self._paramMap:
            raise ValueError(f"{type(self).__name__} has no param {key!r}; valid: {sorted(self._paramMap)}")
        self._paramMap[key] = value
        return self

    def get(self, key: str) -> Any:
        return self._paramMap[key]

    def isSet(self, key: str) -> bool:
        return self._paramMap.get(key) is not None

    def __getattr__(self, name: str):
        # synthesize chainable setters: setMeasurementCol -> _set('measurementCol')
        if name.startswith("set") and len(name) > 3:
            key = name[3].lower() + name[4:]
            pm = self.__dict__.get("_paramMap")
            if pm is not None and key in pm:
                return lambda value, _k=key: self._set(_k, value)
        raise AttributeError(f"{type(self).__name__!r} object has no attribute {name!r}")

    def copy(self):
        out = type(self).__new__(type(self))
        out._paramMap = dict(self._paramMap)
        return out

    # -- persistence (pure-Python analogue of DefaultParamsWritable/Readable) --

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        payload = {
            "class": f"{type(self).__module__}.{type(self).__qualname__}",
            "params": {k: _encode(v) for k, v in self._paramMap.items()},
        }
        with open(os.path.join(path, "params.json"), "w") as f:
            json.dump(payload, f)

    @classmethod
    def load(cls, path: str):
        with open(os.path.join(path, "params.json")) as f:
            payload = json.load(f)
        obj = cls.__new__(cls)
        obj._paramMap = dict(cls._collectDefaults())
        for k, v in payload["params"].items():
            obj._paramMap[k] = _decode(v)
        return obj
