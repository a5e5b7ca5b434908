"""Tokenizer comparison report: the diagnostic a pipeline runs when
CHOOSING its tokenizer — the same corpus encoded under all three trained
families (BPE, Unigram-LM, WordPiece), compared on the metrics the
published evaluations use (fertility = tokens per word, Rust et al. 2021
"How Good is Your Tokenizer?"; bytes per token; UNK share):

    family | vocab_size | total_tokens | fertility | bytes_per_token | unk_rate

NO_SQL entry (the trainers have no SQL expression — the
docs_unigram_tokens/docs_wordpiece_tokens contract); correctness is pinned
by deriving every row from the SAME per-doc encoder outputs the individual
replay-pinned operators already emit, asserted in tests/test_tokeval.py.

100-TB shape: nothing new — each family costs its registry entry's shape
(one word-count pass into the size-gated trainer + one Arrow mapInPandas
encode pass), and the report aggregates three doc-count-sized frames. The
word/byte denominators are one extra projection on the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.bpe import bpe_encode_ids, bpe_train, bpe_vocab
from artan_spark.plans.unigram import unigram_encode_ids, unigram_train
from artan_spark.plans.wordpiece import wordpiece_encode_ids, wordpiece_train
from artan_spark.sources import read_table_wide


def _family_row(name: str, enc: DataFrame, denom: DataFrame, vocab_size: int) -> DataFrame:
    """(family, vocab_size, total_tokens, fertility, bytes_per_token,
    unk_rate) from a per-doc (doc_id, ids, n_tokens) frame and the shared
    corpus denominators (n_words, n_bytes — built ONCE by the caller: the
    word-split denominator pass used to run per family, three identical
    subtrees over the same scan). UNK is id 0 in all three families by
    construction."""
    unks = F.size(F.filter("ids", lambda x: x == F.lit(0)))
    per_doc = enc.select("doc_id", "n_tokens", unks.alias("n_unk"))
    agg = per_doc.agg(
        F.sum("n_tokens").alias("total_tokens"), F.sum("n_unk").alias("n_unk")
    )
    return agg.crossJoin(F.broadcast(denom)).select(
        F.lit(name).alias("family"),
        F.lit(vocab_size).cast("long").alias("vocab_size"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.round(F.col("total_tokens") / F.col("n_words"), 6).alias("fertility"),
        F.round(F.col("n_bytes") / F.col("total_tokens"), 6).alias("bytes_per_token"),
        F.round(F.col("n_unk") / F.col("total_tokens"), 6).alias("unk_rate"),
    )


def tokenizer_eval(
    docs: DataFrame,
    merges: list | None = None,
    logp: dict | None = None,
    pieces: list | None = None,
    vocab: list | None = None,
) -> DataFrame:
    """The three-family comparison over one corpus frame (doc_id, text).
    Pre-trained models can be passed in (the driver entry reuses the
    session-memoized corpus fits); anything omitted trains here with each
    family's registry defaults."""
    from artan_spark.plans.unigram import UNIGRAM_MIN_COUNT, UNIGRAM_TRAIN_WORDS, UNIGRAM_VOCAB
    from artan_spark.plans.wordpiece import WP_MERGES, WP_MIN_COUNT, WP_TRAIN_WORDS

    if merges is None:
        merges = bpe_train(docs)
    if vocab is None:
        vocab = bpe_vocab(docs, merges)
    if logp is None:
        logp = unigram_train(
            docs,
            vocab_size=UNIGRAM_VOCAB,
            min_count=UNIGRAM_MIN_COUNT,
            max_train_words=UNIGRAM_TRAIN_WORDS,
        )
    if pieces is None:
        pieces = wordpiece_train(
            docs, n_merges=WP_MERGES, min_count=WP_MIN_COUNT, max_train_words=WP_TRAIN_WORDS
        )
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    denom = docs.select(
        F.sum(words).alias("n_words"),
        F.sum(F.length("text")).alias("n_bytes"),
    )
    rows = [
        _family_row("bpe", bpe_encode_ids(docs, merges, vocab), denom, len(vocab)),
        _family_row("unigram", unigram_encode_ids(docs, logp), denom, len(logp)),
        _family_row("wordpiece", wordpiece_encode_ids(docs, pieces), denom, len(pieces)),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def docs_tokenizer_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: the tokenizer comparison over ``documents``,
    reusing the session-memoized corpus fits of all THREE families (the
    BPE merges+vocab used to retrain per invocation — two word-count
    passes plus the driver merge loop on every call; `bpe._corpus_bpe`
    now holds them under the same session-memo contract as the
    unigram/wordpiece fits)."""
    from artan_spark.plans.bpe import _corpus_bpe
    from artan_spark.plans.unigram import _corpus_table
    from artan_spark.plans.wordpiece import _corpus_pieces

    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "text")
    merges, vocab = _corpus_bpe(spark, sf_dir, d)
    return tokenizer_eval(
        d,
        merges=merges,
        logp=_corpus_table(spark, sf_dir, d),
        pieces=_corpus_pieces(spark, sf_dir, d),
        vocab=vocab,
    )


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES = {"docs_tokenizer_eval": docs_tokenizer_eval}
