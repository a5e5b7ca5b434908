"""Streaming NEAR-duplicate filtering (MinHash-LSH) — the fuzzy counterpart
of ``streaming_dedup_exact``.

Semantics (shared by the batch window formulation and the streaming
operators, and what the DuckDB oracle in ``plans/dedup.py`` checks): a
document is a near-duplicate iff ANY of its MinHash LSH band buckets
already contains a document with a smaller doc_id; ``dup_of`` is the
smallest such bucket owner. This is the candidate-level LSH criterion —
identical to ``dedup_minhash_lsh``'s pair generation, evaluated
incrementally.

Pipeline shape (both modes):

    docs ─> minhash_bands (STATELESS row-wise array exprs: per-doc distinct
            shingles, 8 permutation minima, banded signatures — no shuffle,
            stream-safe)
         ─> BucketFirstSeen   keyed by (band, sig): state = min doc_id seen,
                              O(1) per bucket
         ─> BandVote          keyed by doc_id: state = (votes, min owner),
                              emits exactly when all bands have voted

Two keyed stateful folds = two hash shuffles, the same composition shape as
the reference's filter+smoother chaining (LinearKalmanSmoother.scala:87-94).
At 100 TB: bucket state is bounded by #distinct buckets x 16 bytes, vote
state by #in-flight docs; both are per-key O(1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artan_spark.operators.base import STATE_KEY, StatefulTransformer, empty_pdf
from artan_spark.plans.dedup import N_PERMS, P31, PERMS, ROWS_PER_BAND, _h64
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_BANDS = N_PERMS // ROWS_PER_BAND


def minhash_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str | None = None,
) -> DataFrame:
    """(id, band, sig) LSH band signatures as pure row-wise array
    expressions — per-doc distinct word-3-grams, the 8 affine-permutation
    minima, then banded signature strings. No explode-then-groupBy, no
    shuffle, so the same definition runs on batch frames and streams.
    Documents with fewer than 3 tokens have no shingles and emit no bands
    (matching ``dedup_minhash_lsh``, where they never enter the bucket
    join).

    Each derived array lives in its OWN projection (tokens -> shingles ->
    hashes -> minima): an alias referenced more than once by non-cheap
    consumers is not collapsed back by Catalyst, so the token split runs
    once per row (not once per shingle slot) and the md5 hash runs once
    per shingle (not once per permutation). The single-projection form of
    this function evaluated md5 8x per shingle and split ~L times per doc
    — measured 60 s for 5000 docs at sf0.1; staged it is sub-second."""
    extra = [F.col(event_time_col).alias("ts")] if event_time_col else []
    keep = ["doc_id"] + (["ts"] if event_time_col else [])

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra,
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks__"),
    )
    t = F.col("__toks__")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", t[i], t[i + 1], t[i + 2]),
        )
    )
    # <3 tokens -> no shingles -> drop the doc here rather than colliding
    # every short doc in one degenerate empty-signature bucket
    shingled = toked.filter(F.size(t) >= 3).select(*keep, sh.alias("__sh__"))
    hashed = shingled.select(
        *keep, F.transform(F.col("__sh__"), lambda s: _h64(s) % P31).alias("__h__")
    )
    mined = hashed.select(
        *keep,
        *[
            F.array_min(
                F.transform(F.col("__h__"), lambda x: (F.lit(a) * x + F.lit(b)) % P31)
            ).alias(f"__mh{i}__")
            for i, (a, b) in enumerate(PERMS)
        ],
    )
    sigs = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.col(f"__mh{band * ROWS_PER_BAND + r}__").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
            for band in range(N_BANDS)
        ]
    )
    return mined.select(*keep, F.posexplode(sigs).alias("band", "sig"))


_OWNER_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("doc_id", LongType()),
        StructField("owner", LongType(), True),
    ]
)


class BucketFirstSeen(StatefulTransformer):
    """Per LSH bucket: emit, for each arriving doc, the smallest doc_id
    previously seen in the bucket (null for the bucket's first/lowest doc).
    State is ONE long per bucket. Batch groups are processed in doc_id
    order so the batch result equals the window formulation regardless of
    partition layout; a stream replayed in doc_id order matches it
    row-for-row."""

    def _constants(self):
        return {}

    def _inputCols(self, df):
        return [("doc_id", F.col("doc_id").cast("long"))]

    def _outSchema(self):
        return _OWNER_OUT

    def _stateSchema(self):
        return StructType([StructField("mn", LongType(), True)])

    def _foldFactory(self):
        def factory(_c):
            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _OWNER_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                ids = np.sort(pdf["doc_id"].to_numpy(dtype=np.int64), kind="stable")
                mn = state["mn"] if state is not None else None
                owners = []
                for d in ids:
                    owners.append(int(mn) if mn is not None and mn < d else None)
                    mn = int(d) if mn is None or d < mn else mn
                out = pd.DataFrame(
                    {STATE_KEY: [key] * len(ids), "doc_id": ids, "owner": owners},
                    columns=names,
                )
                return out, {"mn": mn}

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["mn"],)

    @staticmethod
    def _unpackState(packed):
        return {"mn": packed[0]}


_VOTE_OUT = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField("is_dup", BooleanType()),
        StructField("dup_of", LongType(), True),
    ]
)


class BandVote(StatefulTransformer):
    """Per doc: collect one vote per band; emit (is_dup, dup_of=min
    non-null owner) exactly once, on the batch where the vote count CROSSES
    n_bands. The edge check (prev < n_bands <= now), not a level check,
    keeps the contract under at-least-once replay: duplicate band rows
    arriving after the emission add votes but never re-emit. State is
    (votes, min_owner) — two longs per in-flight doc."""

    _defaults = {"nBands": N_BANDS}

    def _constants(self):
        return {"n_bands": int(self.get("nBands"))}

    def _inputCols(self, df):
        return [("owner", F.col("owner").cast("long"))]

    def _outSchema(self):
        return _VOTE_OUT

    def _stateSchema(self):
        return StructType(
            [StructField("votes", LongType()), StructField("mn", LongType(), True)]
        )

    def _foldFactory(self):
        def factory(c):
            n_bands = c["n_bands"]

            def fold(pdf: pd.DataFrame, state):
                names = [f.name for f in _VOTE_OUT.fields]
                if len(pdf) == 0:
                    return empty_pdf(names), state
                key = pdf[STATE_KEY].iloc[0]
                prev_votes = state["votes"] if state is not None else 0
                votes = prev_votes
                mn = state["mn"] if state is not None else None
                for owner in pdf["owner"]:
                    votes += 1
                    if owner is not None and not pd.isna(owner):
                        owner = int(owner)
                        mn = owner if mn is None or owner < mn else mn
                state = {"votes": votes, "mn": mn}
                if prev_votes < n_bands <= votes:
                    out = pd.DataFrame(
                        {STATE_KEY: [key], "is_dup": [mn is not None], "dup_of": [mn]},
                        columns=names,
                    )
                    return out, state
                return empty_pdf(names), state

            return fold

        return factory

    @staticmethod
    def _packState(state):
        return (state["votes"], state["mn"])

    @staticmethod
    def _unpackState(packed):
        return {"votes": packed[0], "mn": packed[1]}


def streaming_near_dup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str | None = None,
    horizon: str | None = None,
) -> DataFrame:
    """Compose the full near-dup filter: bands -> bucket owners -> band
    votes. Returns (doc_id, is_dup, dup_of); one row per document with >=3
    tokens. Works on batch frames and (operator-by-operator) on streams;
    chaining two stateful operators in ONE streaming query needs
    event-time mode on Spark, so streamed use typically materializes the
    owner stage (see tests/test_neardup.py for the replay pattern).

    ``event_time_col`` + ``horizon`` bound the bucket state on unbounded
    streams (the same contract as ``streaming_dedup_exact``): a bucket
    whose owner has seen no traffic for ``horizon`` of event time is
    evicted, so a later near-duplicate outside the horizon is treated as
    fresh — O(horizon-volume) state instead of O(stream) state. The
    horizon is exact in EVENT time on both sides (base.py enforces it with
    an engine timer for memory reclamation plus an access-time gap check):
    a duplicate arriving within the horizon is always flagged, one beyond
    it never is, regardless of micro-batch layout. Omit both for exact
    full-history semantics (batch, or bounded replays).
    """
    bands = minhash_bands(docs, id_col, text_col, event_time_col).withColumn(
        "bucket", F.concat_ws(":", F.col("band").cast("string"), "sig")
    )
    op1 = BucketFirstSeen().setStateKeyCol("bucket")
    if event_time_col and horizon:
        op1 = (
            op1.setEventTimeCol("ts")
            .setWatermarkDuration(horizon)
            .setStateTimeoutMode("event")
        )
    owners = op1.transform(bands)
    votes = (
        BandVote()
        .setStateKeyCol("doc_id")
        .transform(owners.select(F.col("doc_id"), "owner"))
    )
    return votes.select(
        F.col(STATE_KEY).cast("long").alias("doc_id"), "is_dup", "dup_of"
    )
