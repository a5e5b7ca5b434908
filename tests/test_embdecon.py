"""Embedding-based (semantic) decontamination — behavior tests.

Oracle parity for ``docs_decontaminate_embedding`` runs in test_oracle.py
(PYTEST_ORACLES, both the sf0.001 suite pass and the sf0.01 margin pass);
here: planted-leak recovery, the eval-size gate, and degenerate inputs.
"""

import numpy as np
import pytest

from artan_spark.plans.sampling import (
    EMB_DECON_THRESHOLD,
    embedding_decontaminate,
)

DIM = 16


def _frame(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _rand(rng, n):
    return rng.standard_normal((n, DIM))


def test_planted_leak_recovered(spark):
    """A train doc that IS an eval doc (plus tiny noise) is flagged with the
    right eval id and cosine ~1; independent random docs are not."""
    rng = np.random.default_rng(7)
    ev = _rand(rng, 5)
    clean = _rand(rng, 20)
    leak = ev[3] + 1e-3 * rng.standard_normal(DIM)
    train = _frame(spark, [(i, v) for i, v in enumerate(clean)] + [(99, leak)])
    evdf = _frame(spark, [(100 + i, v) for i, v in enumerate(ev)])
    out = {r["train_vec_id"]: r for r in embedding_decontaminate(train, evdf).collect()}
    assert 99 in out
    assert out[99]["eval_vec_id"] == 103
    assert out[99]["max_cosine"] > 0.999
    # random 16-dim cosines concentrate near 0; none of the clean docs
    # should clear the threshold at these sizes with this seed
    flagged_clean = [k for k in out if k != 99]
    for k in flagged_clean:
        assert out[k]["max_cosine"] >= EMB_DECON_THRESHOLD


def test_exact_copy_cosine_is_one(spark):
    rng = np.random.default_rng(11)
    v = _rand(rng, 1)[0]
    train = _frame(spark, [(1, v)])
    evdf = _frame(spark, [(2, v)])
    [r] = embedding_decontaminate(train, evdf).collect()
    assert (r["train_vec_id"], r["eval_vec_id"]) == (1, 2)
    assert r["max_cosine"] == pytest.approx(1.0, abs=1e-6)


def test_tie_breaks_to_smallest_eval_id(spark):
    """Two identical eval vectors: the flag names the smaller vec_id, the
    same tiebreak as the oracle's ORDER BY cosine DESC, eval_vec_id ASC."""
    rng = np.random.default_rng(3)
    v = _rand(rng, 1)[0]
    train = _frame(spark, [(1, v)])
    evdf = _frame(spark, [(20, v), (10, v)])
    [r] = embedding_decontaminate(train, evdf).collect()
    assert r["eval_vec_id"] == 10


def test_eval_limit_gate_raises(spark):
    rng = np.random.default_rng(5)
    train = _frame(spark, [(1, _rand(rng, 1)[0])])
    evdf = _frame(spark, [(i, v) for i, v in enumerate(_rand(rng, 4))])
    with pytest.raises(ValueError, match="eval_limit"):
        embedding_decontaminate(train, evdf, eval_limit=3)


def test_empty_eval_set_flags_nothing(spark):
    rng = np.random.default_rng(9)
    train = _frame(spark, [(1, _rand(rng, 1)[0])])
    evdf = _frame(spark, []).limit(0)
    out = embedding_decontaminate(train, evdf)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "train_vec_id",
        "eval_vec_id",
        "max_cosine",
    ]


def test_streaming_serving_matches_batch(spark):
    """embedding_decontaminate is a pure Arrow projection against a
    broadcast eval matrix, so the SAME definition runs on a readStream:
    chunked replay == batch row-for-row (live-ingest leak screening,
    the text twin of the quality model's streaming serving path)."""
    from artan_spark.streaming import stream_transform

    rng = np.random.default_rng(21)
    ev = _frame(spark, [(100 + i, v) for i, v in enumerate(_rand(rng, 6))])
    vecs = list(_rand(rng, 40))
    vecs[7] = np.asarray(ev.collect()[2]["embedding"], dtype=float)  # planted leak
    train = _frame(spark, [(i, v) for i, v in enumerate(vecs)])

    batch = {r["train_vec_id"]: r for r in embedding_decontaminate(train, ev).collect()}
    streamed = stream_transform(
        spark,
        train,
        lambda df: embedding_decontaminate(df, ev),
        chunk_rows=9,
    )
    got = {r["train_vec_id"]: r for r in streamed.collect()}
    assert 7 in got and got[7]["max_cosine"] > 0.999999
    assert set(got) == set(batch)
    for k in got:
        assert got[k].asDict() == batch[k].asDict(), k


def test_persisted_eval_index_matches_inline(spark, tmp_path):
    """screen_against_eval_index(persisted) == embedding_decontaminate
    (inline) row-for-row — the frozen-eval-set daily screening contract."""
    from artan_spark.plans.sampling import (
        persist_eval_index,
        screen_against_eval_index,
    )

    rng = np.random.default_rng(31)
    ev = _frame(spark, [(200 + i, v) for i, v in enumerate(_rand(rng, 8))])
    vecs = list(_rand(rng, 30))
    vecs[11] = np.asarray(ev.collect()[5]["embedding"], dtype=float)
    batch = _frame(spark, [(i, v) for i, v in enumerate(vecs)])

    idx = str(tmp_path / "evidx")
    persist_eval_index(ev, idx)
    inline = sorted(
        (r.asDict() for r in embedding_decontaminate(batch, ev).collect()),
        key=lambda d: d["train_vec_id"],
    )
    stored = sorted(
        (r.asDict() for r in screen_against_eval_index(spark, idx, batch).collect()),
        key=lambda d: d["train_vec_id"],
    )
    assert inline == stored
    assert any(d["train_vec_id"] == 11 for d in stored)
