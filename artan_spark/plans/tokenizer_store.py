"""Persisted tokenizer models — save/load for all three trained families
(BPE merges, Unigram-LM piece log-probs, WordPiece pieces), so encode-only
sessions and downstream jobs never retrain: the ``persist_quality_model``
discipline applied to tokenizers (a production pipeline trains the
tokenizer ONCE on a fixed snapshot and every later encode pass — packing,
budgeting, perplexity — must use byte-identical vocabulary, or token ids
silently shift between runs).

Layout (``model_dir``): ``/model`` parquet rows (family-specific columns)
+ ``/meta`` 1 row (kind). Everything is vocabulary-sized — reads and
writes are bounded by the vocab, never the corpus.

Round-trips are exact: the loaded model compares equal (==) to the trained
in-memory object, so every determinism/replay contract the trainers pin
carries over to loaded models unchanged (tested per family, including an
encode-equality check)."""

from __future__ import annotations

from pyspark.sql import SparkSession

KINDS = ("bpe", "unigram", "wordpiece")


def save_tokenizer(spark: SparkSession, model_dir: str, kind: str, model) -> None:
    """Persist a trained tokenizer. ``model`` is the family's native
    object: BPE merges ``list[(a, b)]``, Unigram ``{piece: logp}``,
    WordPiece ``list[piece]``."""
    if kind == "bpe":
        rows = [(i, a, b) for i, (a, b) in enumerate(model)]
        df = spark.createDataFrame(rows, "rank long, a string, b string")
    elif kind == "unigram":
        rows = sorted(model.items())
        df = spark.createDataFrame(rows, "piece string, logp double")
    elif kind == "wordpiece":
        df = spark.createDataFrame([(p,) for p in sorted(model)], "piece string")
    else:
        raise ValueError(f"unknown tokenizer kind {kind!r}; expected one of {KINDS}")
    df.coalesce(1).write.mode("overwrite").parquet(model_dir + "/model")
    spark.createDataFrame([(kind,)], "kind string").write.mode("overwrite").parquet(
        model_dir + "/meta"
    )


def load_tokenizer(spark: SparkSession, model_dir: str):
    """Returns ``(kind, model)`` with ``model`` == the object that was
    saved (exact round-trip: merge order by rank, float logp bits, sorted
    piece list)."""
    kind = spark.read.parquet(model_dir + "/meta").first()["kind"]
    rows = spark.read.parquet(model_dir + "/model").collect()
    if kind == "bpe":
        return kind, [
            (r["a"], r["b"]) for r in sorted(rows, key=lambda r: r["rank"])
        ]
    if kind == "unigram":
        return kind, {r["piece"]: r["logp"] for r in rows}
    if kind == "wordpiece":
        return kind, sorted(r["piece"] for r in rows)
    raise ValueError(f"stored tokenizer has unknown kind {kind!r}")


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES: dict = {}
