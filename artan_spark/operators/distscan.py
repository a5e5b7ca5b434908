"""DISTRIBUTED parallel-scan execution of the scalar constant-model LKF.

The in-task scan engine (operators/vectorized.py, Särkkä &
García-Fernández 2021) removes the rows-per-key SERIAL bound but not the
rows-per-key TASK bound: ``groupBy(stateKey).applyInPandas`` still lands a
hot key's entire history on ONE task — one core's worth of throughput and
one executor's worth of memory, the remaining 100-TB skew risk.

This engine distributes the same associative scan across tasks:

  1. rows are chunked by event time (``floor(eventTime / scanChunkDuration)``
     — a DETERMINISTIC, sample-free partitioning key, so the two passes
     never depend on cached partition placement the way a
     ``repartitionByRange`` pid-coupled design would);
  2. **pass 1** — ``groupBy(stateKey, chunk).applyInPandas`` combines each
     chunk's GENERIC per-row elements (no prior folded in) into ONE
     five-scalar element via the in-task doubling scan and emits a single
     summary row per chunk;
  3. the **driver** prefix-combines each key's chunk summaries in chunk
     order — O(#chunks) five-scalar combines, microseconds — producing the
     exact incoming distribution (m, P) and stateIndex offset for every
     chunk, starting from the per-key prior (the prior is the degenerate
     element (A=0, b=m0, C=P0, eta=0, J=0); ``combine(prior, element)``
     IS predict+update, pinned by tests/test_dist_scan.py);
  4. **pass 2** — the same ``groupBy(stateKey, chunk)`` re-runs the
     in-task scan per chunk, seeded with its broadcast incoming
     distribution, and emits the final rows.

Cost: two linear shuffles of the input (Spark reuses the exchange when
AQE sees the identical child plan) + one tiny driver job; wall-clock for
a single hot key drops from one task to ``#chunks``-way parallelism.
Semantics: identical formulas to the in-task scan; float association
order differs across chunk boundaries, so parity with the sequential
recursion stays at the scan engine's ~1e-12 relative (same contract).

Scope (``supports_distributed_scan``): the in-task scan's shape
(scalar constant-model LKF, no fading/control/multi-step) MINUS sliding
likelihood — its rolling window needs the previous chunk's trailing
loglikelihood VALUES, which only exist after pass 2 — PLUS a required
``eventTimeCol`` (the chunking key; it is also what makes a distributed
total order well-defined at all).

Opt in with ``setFoldEngine("distributedScan")``. The auto engine never
promotes to it: two shuffles only pay for themselves when single keys
are long enough to bottleneck one task (~1M+ rows/key); short-key
workloads already parallelize across keys.

Parity surface: reference LinearKalmanFilter semantics
(/root/reference/src/main/scala/com/github/ozancicek/artan/ml/filter/
LinearKalmanFilter.scala:60-260) — same results as the batch operator,
different physical strategy.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from artan_spark.operators.base import EVENT_TIME, STATE_KEY, empty_pdf
from artan_spark.operators.vectorized import (
    VFLAT_SCALAR_OUT_SCHEMA,
    _scalar_combine,
    _scalar_generic_elements,
    _scalar_scan_emit,
    _scalar_scan_forward,
    _scalar_segmented_scan,
    extract_scalar_measurements,
    supports_scan,
)
from artan_spark.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHUNK = "__scanChunk__"

# chunk id for null event times: sorts before every real chunk, matching
# the sequential fold's nulls-first in-key ordering
_NULL_CHUNK = -(1 << 62)

_PASS1_SCHEMA = StructType(
    [
        StructField(STATE_KEY, StringType()),
        StructField(CHUNK, LongType()),
        StructField("n", LongType()),
        StructField("elA", DoubleType()),
        StructField("elB", DoubleType()),
        StructField("elC", DoubleType()),
        StructField("elEta", DoubleType()),
        StructField("elJ", DoubleType()),
        StructField("m0ovr", DoubleType(), True),
        StructField("p0ovr", DoubleType(), True),
    ]
)


def supports_distributed_scan(c: dict) -> bool:
    """The in-task scan's shape minus sliding likelihood (whose rolling
    window crosses chunk boundaries with values only pass 2 produces)."""
    return supports_scan(c) and not c.get("calculateSlidingLikelihood")


def _first_row_prior_override(pdf: pd.DataFrame):
    """(mean, cov) from the group's first row's initialStateDistribution
    cell, or (None, None). Only the key's FIRST chunk's value is consulted
    by the driver — same row the in-task engines read."""
    if "initialStateDistribution" not in pdf.columns:
        return None, None
    d = pdf["initialStateDistribution"].values[0]
    if d is None:
        return None, None
    if isinstance(d, dict):
        return float(d["mean"][0]), float(d["covariance"]["values"][0])
    return float(d.mean[0]), float(d.covariance.values[0])


def distributed_scan_transform(op, df: DataFrame) -> DataFrame:
    """Execute ``op`` (a scalar constant-model LinearKalmanFilter) over
    batch ``df`` with the two-pass distributed scan. Returns the same
    public schema as every other engine (via ``op._shapeOutput``)."""
    c = op._constants()
    if df.isStreaming:
        raise ValueError(
            "foldEngine='distributedScan' is a batch engine (streaming "
            "micro-batches are rows-per-trigger-bound, not "
            "rows-per-key-bound)"
        )
    if not op.get("eventTimeCol"):
        raise ValueError(
            "foldEngine='distributedScan' requires setEventTimeCol: event "
            "time is the chunking key and the distributed total order"
        )
    if not supports_distributed_scan(c):
        raise ValueError(
            "foldEngine='distributedScan' requires a constant-model scalar "
            "LKF shape with fadingFactor=1 and no sliding likelihood — use "
            "foldEngine='scan' or 'sequential' for this configuration"
        )

    f = float(c["processModel"][0, 0])
    q = float(c["processNoise"][0, 0])
    h = float(c["measurementModel"][0, 0])
    rr = float(c["measurementNoise"][0, 0])
    m0 = float(c["initialStateMean"][0])
    p0 = float(c["initialStateCovariance"][0, 0])
    compute_ll = bool(c["calculateLoglikelihood"])
    compute_maha = bool(c["calculateMahalanobis"])
    names = [fld.name for fld in VFLAT_SCALAR_OUT_SCHEMA.fields]

    width_s = pd.Timedelta(op.get("scanChunkDuration")).total_seconds()
    if not width_s > 0:
        raise ValueError("scanChunkDuration must be a positive duration")

    keyed = op._keyed(df)
    chunked = keyed.withColumn(
        CHUNK,
        F.coalesce(
            F.floor(F.col(EVENT_TIME).cast("double") / F.lit(float(width_s))).cast("long"),
            F.lit(_NULL_CHUNK),
        ),
    )

    # ---- pass 1: one combined generic element per (key, chunk) ---------
    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([EVENT_TIME], kind="stable", na_position="first")
        N = len(pdf)
        z_cells = pdf["measurement"].values
        has_z = np.array([z is not None for z in z_cells])
        Z = extract_scalar_measurements(z_cells, has_z, N)
        A, b, C, eta, J = _scalar_generic_elements(Z, has_z, N, f, q, h, rr)
        _scalar_segmented_scan(A, b, C, eta, J, np.arange(N), N)
        m0o, p0o = _first_row_prior_override(pdf)
        return pd.DataFrame(
            {
                STATE_KEY: [pdf[STATE_KEY].values[0]],
                CHUNK: [np.int64(pdf[CHUNK].values[0])],
                "n": [np.int64(N)],
                "elA": [A[-1]],
                "elB": [b[-1]],
                "elC": [C[-1]],
                "elEta": [eta[-1]],
                "elJ": [J[-1]],
                "m0ovr": [m0o],
                "p0ovr": [p0o],
            }
        )

    summaries = chunked.groupBy(STATE_KEY, CHUNK).applyInPandas(reduce_fn, _PASS1_SCHEMA)
    max_groups = int(op.get("distributedScanMaxGroups"))
    # take() bounds the driver collect: > max_groups (key, chunk) summaries
    # means the chunking is too fine (or the workload is many-key and does
    # not want this engine at all) — fail with guidance, never OOM the
    # driver. One extra job over the TINY summary frame only.
    rows = summaries.take(max_groups + 1)
    if len(rows) > max_groups:
        raise ValueError(
            f"distributedScan produced > {max_groups} (key, chunk) groups; "
            "widen scanChunkDuration (driver prefix state is O(#groups)), "
            "raise distributedScanMaxGroups, or use the in-task engines — "
            "many-key workloads already parallelize across keys"
        )

    # ---- driver prefix: incoming (m, P, stateIndex offset) per chunk ----
    by_key: dict = defaultdict(list)
    for r in rows:
        by_key[r[STATE_KEY]].append(r)
    seeds: dict = {}
    for k, lst in by_key.items():
        lst.sort(key=lambda r: r[CHUNK])
        ovr_m, ovr_p = lst[0]["m0ovr"], lst[0]["p0ovr"]
        m = ovr_m if ovr_m is not None else m0
        p = ovr_p if ovr_p is not None else p0
        off = 0
        for r in lst:
            seeds[(k, r[CHUNK])] = (m, p, off)
            e = _scalar_combine(
                (0.0, m, p, 0.0, 0.0),
                (r["elA"], r["elB"], r["elC"], r["elEta"], r["elJ"]),
            )
            m, p = e[1], e[2]
            off += r["n"]
    seeds_bc = df.sparkSession.sparkContext.broadcast(seeds)

    # ---- pass 2: seeded in-task scan per chunk --------------------------
    def scan_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        N = len(pdf)
        if N == 0:
            return empty_pdf(names)
        m_in, p_in, off = seeds_bc.value[
            (pdf[STATE_KEY].values[0], int(pdf[CHUNK].values[0]))
        ]
        pdf = pdf.sort_values([EVENT_TIME], kind="stable", na_position="first")
        fwd = _scalar_scan_forward(
            pdf, N, f, q, h, rr, m0, p0,
            prior_override=(np.array([m_in]), np.array([p_in])),
        )
        return _scalar_scan_emit(
            fwd, N, f, q, h, rr,
            compute_ll=compute_ll, compute_maha=compute_maha,
            compute_sll=False, ll_window=1, names=names, idx_offset=off,
        )

    res = chunked.groupBy(STATE_KEY, CHUNK).applyInPandas(scan_fn, VFLAT_SCALAR_OUT_SCHEMA)
    return op._shapeOutput(res)
