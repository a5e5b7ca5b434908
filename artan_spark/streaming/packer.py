"""Streaming sequence packing: per-stream running token offsets as state.

The batch packer (plans/sampling.py ``pack_sequences``) assigns each doc a
start offset via one window per hash stream; under Structured Streaming
the same assignment runs incrementally — the only state is ONE long per
stream (the next write offset), so a live ingest pipeline can route each
arriving document to its training-sequence id with O(1) state and no
reprocessing. Docs are folded in doc_id order within each micro-batch;
feed streams in doc_id order (the natural ingest order for monotone ids)
and any chunking reproduces the batch assignment row-for-row — asserted
against ``pack_sequences`` itself in tests/test_heavy_hitters.py.

Out-of-order ingest is DETECTED, not silently absorbed: state tracks the
max packed doc_id per stream, and a micro-batch whose min doc_id is at or
behind that frontier raises — a late batch would otherwise shift every
subsequent offset away from the batch assignment with no error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from artan_spark.operators.base import STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.types import LongType, StringType, StructField, StructType

_PK_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("start_off", LongType()),
        StructField("seq_id", LongType()),
        StructField("n_seqs", LongType()),
    ]
)

_PK_STATE = StructType(
    [StructField("next_off", LongType()), StructField("max_doc_id", LongType())]
)


class StreamingPacker(StatefulTransformer):
    """Keyed streaming concat-and-cut packing with O(1) offset state."""

    _defaults = {
        "seqLen": 2048,
        "docIdCol": "doc_id",
        "tokensCol": "n_tokens",
    }

    def setSeqLen(self, value):
        v = int(value)
        if v <= 0:
            raise ValueError(f"seqLen must be positive, got {v}")
        return self._set("seqLen", v)

    def setDocIdCol(self, value):
        return self._set("docIdCol", value)

    def setTokensCol(self, value):
        return self._set("tokensCol", value)

    def _constants(self):
        return {"seq_len": int(self.get("seqLen"))}

    def _inputCols(self, df):
        return [
            ("doc_id", F.col(self.get("docIdCol")).cast("long")),
            ("n_tokens", F.col(self.get("tokensCol")).cast("long")),
        ]

    def _outSchema(self):
        return _PK_OUT

    def _stateSchema(self):
        return _PK_STATE

    def _foldFactory(self):
        def factory(c):
            seq_len = c["seq_len"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _PK_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                off = 0 if state is None else state["next_off"]
                seen_max = None if state is None else state["max_doc_id"]
                p = pdf.sort_values("doc_id", kind="mergesort")
                first_id = int(p["doc_id"].iloc[0])
                if seen_max is not None and first_id <= seen_max:
                    # A late micro-batch behind the packed frontier would
                    # silently shift every subsequent offset away from the
                    # batch assignment — fail loudly instead. Feed streams
                    # in doc_id order (monotone ingest ids), or buffer and
                    # re-sort upstream before the packer.
                    raise ValueError(
                        f"StreamingPacker stream {key!r}: out-of-order ingest — "
                        f"doc_id {first_id} arrived after doc_id {seen_max} was "
                        "already packed; offsets would silently diverge from the "
                        "batch pack_sequences assignment"
                    )
                toks = p["n_tokens"].to_numpy(dtype=np.int64)
                starts = off + np.concatenate(([0], np.cumsum(toks[:-1])))
                out = pd.DataFrame(
                    {
                        STATE_KEY: [key] * len(p),
                        "doc_id": p["doc_id"].to_numpy(dtype=np.int64),
                        "n_tokens": toks,
                        "start_off": starts,
                        "seq_id": starts // seq_len,
                        "n_seqs": (starts + toks - 1) // seq_len - starts // seq_len + 1,
                    },
                    columns=names,
                )
                return out, {
                    "next_off": int(off + toks.sum()),
                    "max_doc_id": int(p["doc_id"].iloc[-1]),
                }

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["next_off"], state["max_doc_id"])

    @staticmethod
    def _unpackState(packed):
        return {"next_off": packed[0], "max_doc_id": packed[1]}
