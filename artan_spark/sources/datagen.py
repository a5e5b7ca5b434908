"""Deterministic synthetic-data generator mirroring the driver testdata
schemas (TESTDATA.md) at arbitrary scale factors.

The driver ships sf0.001/0.01/0.1 read-only; benchmarking the scale story
needs points ABOVE those, so this module regenerates the same 10-table
star schema (same column names/types, same distribution shapes: ~6M*sf
lineitem rows, 30-day event window, vocab-sampled documents with a ~5%
mutated near-dup tail, 10-cluster Gaussian embeddings) from a fixed seed.
Numbers produced on generated dirs are comparable ROUND-OVER-ROUND (same
seed => identical bytes), not to the driver's own sf dirs.

Generation is numpy -> pyarrow, no Spark needed: sf0.5 (3M lineitem rows)
takes a few seconds and ~90 MB.

Usage: ``python -m artan_spark.sources.datagen 0.5 /path/out``
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
VOCAB = (
    "spark table column row value key hash sort join group agg filter scan "
    "query window stream batch merge data part order line customer vector "
    "fast slow small big the a"
).split()
LANGS = ["en", "zh", "de", "fr", "es"]

EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
EPOCH_2001 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
EVENTS_T0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
DAY_US = 86_400_000_000


def _ts(col: np.ndarray) -> pa.Array:
    return pa.array(col.astype("datetime64[us]"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [n for n, _ in NATIONS],
        "n_regionkey": pa.array([r for _, r in NATIONS], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{k:09d}" for k in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
    }))

    n_supp = int(10_000 * sf)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{k:09d}" for k in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    w1 = rng.randint(0, len(VOCAB), n_part)
    w2 = rng.randint(0, len(VOCAB), n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [f"{VOCAB[a]} {VOCAB[b]}" for a, b in zip(w1, w2)],
        "p_brand": [f"Brand#{i}" for i in rng.randint(10, 56, n_part)],
        "p_type": [f"TYPE {VOCAB[i]}" for i in rng.randint(0, len(VOCAB), n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
    }))

    n_ord = int(1_500_000 * sf)
    odate = rng.randint(EPOCH_1995 // DAY_US, EPOCH_2001 // DAY_US, n_ord) * DAY_US
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord).astype(np.int64)),
        "o_orderstatus": [("O", "F", "P")[i] for i in rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": _ts(odate),
        "o_orderpriority": [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)],
    }))

    lines_per_order = rng.randint(1, 8, n_ord)  # avg 4 -> ~6M*sf rows
    n_li = int(lines_per_order.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per_order)
    l_odate = np.repeat(odate, lines_per_order)
    linenumber = (np.arange(n_li) - np.repeat(
        np.concatenate(([0], np.cumsum(lines_per_order)[:-1])), lines_per_order
    ) + 1).astype(np.int32)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li).astype(np.int64)),
        "l_linenumber": pa.array(linenumber),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1000.0, 100000.0, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.randint(0, 3, n_li)],
        "l_linestatus": [("F", "O")[i] for i in rng.randint(0, 2, n_li)],
        "l_shipdate": _ts(l_odate + rng.randint(1, 121, n_li).astype(np.int64) * DAY_US),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts(EVENTS_T0 + rng.randint(0, 30 * DAY_US, n_ev)),
        "user_id": pa.array(rng.randint(0, max(n_users, 1), n_ev).astype(np.int64)),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)],
        "value": np.round(rng.uniform(0.0, 100.0, n_ev), 4),
        "props": [f'{{"k": {i}}}' for i in rng.randint(0, 100, n_ev)],
    }))

    n_doc = int(50_000 * sf)
    # Zipfian vocabulary with a realistic size: the first 30 ranks are real
    # (stop)words that go genuinely hot, the tail is rare — real-text
    # document-frequency shape. A tiny uniform vocab (the v1 generator used
    # 30 words) makes EVERY 3-gram shingle hot, which turns the exact
    # shingle-join dedup queries adversarially quadratic and measures the
    # corpus, not the engine (observed: 37x time at 5x scale; with this
    # vocabulary the same plans scale near-linearly).
    vocab_full = VOCAB + [f"tok{i}" for i in range(len(VOCAB), 2000)]
    zipf_p = 1.0 / np.arange(1, len(vocab_full) + 1) ** 1.05
    zipf_p /= zipf_p.sum()
    # one bulk draw consumed via a cursor (25k+ per-doc rng.choice calls
    # rebuild the sampler each time and dominate generation)
    pool = rng.choice(len(vocab_full), int(120 * n_doc * 1.2) + 1000, p=zipf_p)
    cursor = 0
    texts: list[str] = []
    for d in range(n_doc):
        if d > 0 and rng.rand() < 0.05:
            # near-dup tail: mutate ~10% of an earlier doc's tokens
            toks = texts[rng.randint(0, d)].split()
            idx = rng.rand(len(toks)) < 0.1
            for k, i in enumerate(np.nonzero(idx)[0]):
                toks[i] = vocab_full[pool[(cursor + k) % len(pool)]]
            cursor = (cursor + int(idx.sum())) % len(pool)
            texts.append(" ".join(toks))
        else:
            n_tok = int(rng.randint(15, 101))
            if cursor + n_tok > len(pool):
                cursor = 0
            texts.append(" ".join(vocab_full[i] for i in pool[cursor : cursor + n_tok]))
            cursor += n_tok
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": [LANGS[i] for i in np.minimum(rng.geometric(0.6, n_doc) - 1, 4)],
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    n_vec = int(20_000 * sf)
    labels = rng.randint(0, 10, n_vec)
    cents = rng.randn(10, 64) * 2.0
    vecs = (cents[labels] + rng.randn(n_vec, 64)).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))


def ensure_generated(sf: float, out_dir: str, seed: int = 42) -> str:
    """Generate once, reuse across rounds: the marker file pins (sf, seed)
    so a changed request regenerates instead of silently reusing."""
    marker = os.path.join(out_dir, ".generated")
    tag = f"sf={sf} seed={seed} v2"  # v2: Zipfian document vocabulary
    if os.path.exists(marker) and open(marker).read().strip() == tag:
        return out_dir
    generate(sf, out_dir, seed)
    with open(marker, "w") as fh:
        fh.write(tag + "\n")
    return out_dir


if __name__ == "__main__":
    import sys

    generate(float(sys.argv[1]), sys.argv[2])
