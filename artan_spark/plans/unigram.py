"""Unigram-LM (SentencePiece-style) subword tokenizer — the second
tokenizer family major public models train with (Kudo 2018,
arXiv:1804.10959; T5/ALBERT/XLNet lineage), alongside BPE
(``plans/bpe.py``).

Scale architecture — the SAME split as BPE, because the trainer's input
is the word-count aggregate, never the corpus:

1. **Word counting is the corpus-scale step** and runs distributed
   (``bpe.word_counts``: one scan, explode, hash-aggregate). At 100 TB
   this is the only pass over the data.
2. **EM runs on the vocabulary aggregate**, collected behind the same
   explicit size gate as ``bpe_train`` (even web-scale corpora have
   vocabulary-sized distinct-word tables). Seed = frequent substrings up
   to ``MAX_PIECE_LEN``; each round does full forward-backward
   (lattice expectations, not Viterbi approximation) then an M-step
   re-normalization; pruning drops the lowest-expected-count multi-char
   pieces by ``SHRINK`` per round until ``vocab_size`` (single
   characters are never pruned, so every training word stays
   segmentable). Should the distinct-word table ever outgrow the gate,
   the E-step is a pure map over (word, count) rows + one hash-agg per
   iteration — trivially distributable; the gate keeps driver-scale
   training bit-reproducible.
3. **Encoding is distributed again**: Viterbi best-segmentation under
   the learned piece log-probs, Arrow-batched ``mapInPandas`` with the
   (vocab-sized) log-prob table shipped by value and a per-batch word
   memo — identical shape to ``bpe_encode_ids``; the id stream composes
   with ``bpe.pack_token_ids`` unchanged.

Determinism: words are processed in sorted order, EM expectations are
accumulated in that order with plain float64 ops, prune/tie-breaks are
(count, piece)-lexicographic, and the id table is ``[<unk>] + sorted
pieces`` — so the trained vocabulary is a pure function of the corpus,
replayed bit-for-bit by a plain-Python reference in
tests/test_unigram.py (the BPE replay contract).

Unknown characters at encode time emit ``<unk>`` (id 0) with a fixed
logp penalty below the rarest piece, the SentencePiece convention.

The reference engine has no tokenizer; beyond-reference surface.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.bpe import word_counts
from artan_spark.sources import read_table_wide

UNK = "<unk>"
MAX_PIECE_LEN = 8
SEED_SIZE = 1000  # multi-char seed candidates before pruning
EM_ITERS = 2  # EM rounds between prune steps
SHRINK = 0.75  # keep fraction per prune round
UNK_PENALTY = 10.0  # unk logp = (min trained logp) - UNK_PENALTY


def _seed(counts: list[tuple[str, int]], seed_size: int) -> dict[str, float]:
    """Initial piece scores: every substring up to MAX_PIECE_LEN scored by
    count * len (frequent long substrings make good piece candidates);
    all single characters always included. Returns initial log-probs."""
    score: dict[str, int] = {}
    for w, c in counts:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + MAX_PIECE_LEN, n) + 1):
                p = w[i:j]
                score[p] = score.get(p, 0) + c * (j - i)
    chars = sorted({ch for w, _ in counts for ch in w})
    multi = sorted(
        (p for p in score if len(p) > 1), key=lambda p: (-score[p], p)
    )[: max(0, seed_size)]
    pieces = {p: score[p] for p in multi}
    for ch in chars:
        pieces[ch] = score.get(ch, 1)
    total = sum(pieces.values())
    # log(s) - log(total), NOT log(s/total): at corpus scale the ratio of a
    # rare piece's score to a billions-sized total underflows to 0.0 and
    # log() raises; the difference form is exact at any scale
    lt = math.log(total)
    return {p: math.log(s) - lt for p, s in sorted(pieces.items())}


def _e_step(
    counts: list[tuple[str, int]], logp: dict[str, float]
) -> tuple[dict[str, float], float]:
    """Forward-backward over each word's segmentation lattice: expected
    piece usage counts and total corpus log-likelihood. Pure float64,
    word order = caller's sorted order (determinism contract)."""
    expected: dict[str, float] = {}
    ll = 0.0
    neg_inf = float("-inf")
    for word, wc in counts:
        n = len(word)
        spans = []  # (j, i, piece, lp)
        for i in range(1, n + 1):
            for j in range(max(0, i - MAX_PIECE_LEN), i):
                lp = logp.get(word[j:i])
                if lp is not None:
                    spans.append((j, i, word[j:i], lp))
        fwd = [neg_inf] * (n + 1)
        fwd[0] = 0.0
        for j, i, _p, lp in spans:  # spans are i-ascending per construction
            if fwd[j] != neg_inf:
                v = fwd[j] + lp
                fwd[i] = v if fwd[i] == neg_inf else _logaddexp(fwd[i], v)
        if fwd[n] == neg_inf:
            continue  # unsegmentable (cannot happen while chars are kept)
        bwd = [neg_inf] * (n + 1)
        bwd[n] = 0.0
        for j, i, _p, lp in reversed(spans):
            if bwd[i] != neg_inf:
                v = bwd[i] + lp
                bwd[j] = v if bwd[j] == neg_inf else _logaddexp(bwd[j], v)
        total = fwd[n]
        ll += wc * total
        for j, i, p, lp in spans:
            if fwd[j] != neg_inf and bwd[i] != neg_inf:
                e = math.exp(fwd[j] + lp + bwd[i] - total) * wc
                expected[p] = expected.get(p, 0.0) + e
    return expected, ll


def _logaddexp(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def train_unigram_from_counts(
    counts: list[tuple[str, int]],
    vocab_size: int = 120,
    seed_size: int = SEED_SIZE,
    em_iters: int = EM_ITERS,
    shrink: float = SHRINK,
) -> dict[str, float]:
    """EM + prune loop on a (word, count) list — the pure function shared
    by the Spark trainer and the test replay. Returns {piece: logp}."""
    counts = sorted(counts)
    logp = _seed(counts, seed_size)
    while True:
        for _ in range(em_iters):
            expected, _ll = _e_step(counts, logp)
            total = sum(expected.values())
            lt = math.log(total)
            # pieces never used keep a floor only if single-char (coverage);
            # log(e) - log(total) form: see _seed (underflow at corpus scale)
            nxt = {}
            for p in logp:
                e = expected.get(p, 0.0)
                if e > 0.0:
                    nxt[p] = math.log(e) - lt
                elif len(p) == 1:
                    nxt[p] = math.log(1e-12)
            logp = dict(sorted(nxt.items()))
        if len(logp) <= vocab_size:
            return logp
        expected, _ll = _e_step(counts, logp)
        multi = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (expected.get(p, 0.0), p),
        )
        n_chars = len(logp) - len(multi)
        keep_multi = max(
            max(0, vocab_size - n_chars), int(len(multi) * shrink)
        )
        if keep_multi >= len(multi):  # cannot shrink further
            return logp
        drop = set(multi[: len(multi) - keep_multi])
        logp = {p: lp for p, lp in logp.items() if p not in drop}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 120,
    max_vocab_rows: int = 2_000_000,
    min_count: int = 1,
    max_train_words: int | None = None,
) -> dict[str, float]:
    """Learn a unigram-LM piece table from a (text) corpus frame: ONE
    distributed word-count pass, then the size-gated EM loop on the
    aggregate (the ``bpe_train`` contract).

    ``min_count`` / ``max_train_words`` bound the trainer INPUT the way
    SentencePiece's ``--input_sentence_size`` does: drop the long tail
    (count < min_count), then keep the top ``max_train_words`` by
    (count desc, word asc) — a deterministic distributed TakeOrdered, so
    the driver never holds more than that many rows and training cost is
    corpus-size-independent (Zipf: the head carries the piece statistics).
    Encoding still covers the FULL corpus; characters unseen in the
    training subset encode to <unk> like any unknown."""
    wc = word_counts(docs)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    if max_train_words is not None:
        wc = wc.orderBy(F.desc("count"), F.asc("word")).limit(max_train_words)
    else:
        n = wc.count()
        if n > max_vocab_rows:
            raise ValueError(
                f"word vocabulary has {n} rows > max_vocab_rows={max_vocab_rows}; "
                "raise the gate, set max_train_words, or pre-truncate "
                "(e.g. min-count filter) before training"
            )
    counts = [(r["word"], int(r["count"])) for r in wc.collect()]
    return train_unigram_from_counts(counts, vocab_size=vocab_size)


def unigram_vocab(logp: dict[str, float]) -> list[str]:
    """Deterministic id table: ``[<unk>] + sorted(pieces)``. A corpus
    containing the literal string ``<unk>`` (common in web text, within
    MAX_PIECE_LEN) trains it as a piece — skip it so the table stays a
    bijection (the ``bpe_vocab`` seen-set contract; r9 ADVICE). Encoding a
    trained literal ``<unk>`` then resolves to id 0, which decodes back to
    the same string — round-trip preserved."""
    vocab = [UNK] + sorted(p for p in logp if p != UNK)
    assert len(vocab) == len(set(vocab))
    return vocab


def _viterbi(word: str, logp: dict[str, float], unk_lp: float):
    """Shared DP: (best, back) tables. best[n] is the max total logp of
    any segmentation (single unknown characters allowed at ``unk_lp``).
    Tie-break: for equal scores the segmentation whose LAST piece is
    longest wins (j ascending, strict >), applied recursively —
    deterministic for any input."""
    n = len(word)
    neg_inf = float("-inf")
    best = [neg_inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            p = word[j:i]
            lp = logp.get(p)
            if lp is None and i - j == 1:
                lp = unk_lp
            if lp is None or best[j] == neg_inf:
                continue
            v = best[j] + lp
            if v > best[i]:
                best[i], back[i] = v, j
    return best, back


def viterbi_segment(
    word: str, logp: dict[str, float], unk_lp: float
) -> list[str]:
    """Best segmentation under the piece log-probs (max total logp; see
    ``_viterbi`` for the tie-break contract)."""
    best, back = _viterbi(word, logp, unk_lp)
    out = []
    i = len(word)
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def viterbi_logp(word: str, logp: dict[str, float], unk_lp: float) -> float:
    """Total log-probability of the best segmentation — the word's score
    under the unigram LM (the trained table IS a language model; this is
    what SentencePiece's NBestEncoder scores with)."""
    best, _back = _viterbi(word, logp, unk_lp)
    return best[len(word)]


def _unk_logp(logp: dict[str, float]) -> float:
    return (min(logp.values()) if logp else 0.0) - UNK_PENALTY


def unigram_encode_ids(docs: DataFrame, logp: dict[str, float]) -> DataFrame:
    """(doc_id, text) -> (doc_id, ids array<int>, n_tokens): Viterbi
    encoding to token ids — Arrow-batched ``mapInPandas``, log-prob table
    shipped by value (vocab-sized), per-batch word memo (Zipf). Pieces
    absent from the table (unknown characters) encode to id 0 = <unk>.
    Output contract matches ``bpe_encode_ids`` so ``pack_token_ids``
    composes unchanged."""
    vocab = unigram_vocab(logp)
    ids = {s: i for i, s in enumerate(vocab)}
    unk_lp = _unk_logp(logp)
    table = dict(logp)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def word_ids(word):
            v = memo.get(word)
            if v is None:
                v = [ids.get(s, 0) for s in viterbi_segment(word, table, unk_lp)]
                memo[word] = v
            return v

        for pdf in batches:
            out = {"doc_id": [], "ids": [], "n_tokens": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                enc: list[int] = []
                for w in (text or "").split():
                    enc.extend(word_ids(w))
                out["doc_id"].append(int(doc_id))
                out["ids"].append(enc)
                out["n_tokens"].append(len(enc))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        emit, "doc_id long, ids array<int>, n_tokens long"
    )


def unigram_token_counts(docs: DataFrame, logp: dict[str, float]) -> DataFrame:
    """(doc_id, n_tokens) under the learned pieces — the budget/mixing
    input shape (``sampling.docs_token_budget`` etc.)."""
    return unigram_encode_ids(docs, logp).select("doc_id", "n_tokens")


# -- corpus entry ------------------------------------------------------------

UNIGRAM_VOCAB = 96
UNIGRAM_MIN_COUNT = 2
UNIGRAM_TRAIN_WORDS = 2048

# session memo per (applicationId, documents path, freshness token): the
# trained piece table is a pure function of the immutable parquet (the
# simsearch _KMEANS_CACHE contract — fit once per session, every consumer
# shares it; values are vocab-sized dicts, not frames)
_TRAIN_CACHE: dict[tuple, dict] = {}


def _corpus_table(spark: SparkSession, sf_dir: str, d: DataFrame) -> dict[str, float]:
    from artan_spark.plans.simsearch import _evict_stale
    from artan_spark.sources import _path_token

    import os

    path = os.path.join(sf_dir, "documents.parquet")
    key = (spark.sparkContext.applicationId, path, _path_token(path))
    hit = _TRAIN_CACHE.get(key)
    if hit is None:
        hit = unigram_train(
            d,
            vocab_size=UNIGRAM_VOCAB,
            min_count=UNIGRAM_MIN_COUNT,
            max_train_words=UNIGRAM_TRAIN_WORDS,
        )
        _evict_stale(_TRAIN_CACHE, key)
        _TRAIN_CACHE[key] = hit
    return hit


def docs_unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, total_tokens, avg_tokens): the corpus tokenized
    under a unigram-LM vocabulary trained on the corpus itself — the
    per-language token-volume report a mixing/budget stage consumes
    (``docs_token_budget`` shape, but under a LEARNED vocabulary).

    NO_SQL entry: the EM trainer has no SQL expression (DuckDB cannot run
    lattice forward-backward); correctness is pinned by a bit-exact
    plain-Python replay of train + Viterbi + aggregate in
    tests/test_unigram.py, the ``docs_compression_ratio`` contract.

    100-TB shape: one distributed word-count pass bounded to the top
    ``UNIGRAM_TRAIN_WORDS`` head for the driver EM (deterministic
    TakeOrdered), one Arrow mapInPandas encode pass over the corpus, one
    language-cardinality aggregate."""
    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    logp = _corpus_table(spark, sf_dir, d)
    enc = unigram_token_counts(d, logp)
    return (
        d.select("doc_id", "lang")
        .join(enc, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


def unigram_doc_scores(docs: DataFrame, logp: dict[str, float]) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_tokens, nll, ppl): per-doc negative
    log-likelihood per token and perplexity under the unigram LM — the
    trained piece table IS a language model, so this is the subword
    companion of the word-bigram CCNet gate (``plans/lm.py``): low-ppl
    docs look like the training head, high-ppl docs are junk/outliers.
    Same Arrow mapInPandas + per-batch word memo shape as the encoder;
    nll/ppl round to 6 dp (cross-engine replay contract)."""
    unk_lp = _unk_logp(logp)
    table = dict(logp)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def score(word):
            v = memo.get(word)
            if v is None:
                best, _ = _viterbi(word, table, unk_lp)
                n = len(word)
                # piece count of the best segmentation via backtrace-free
                # recount: re-run segment (memoized per word, Zipf-cheap)
                k = len(viterbi_segment(word, table, unk_lp))
                v = (-best[n], k)
                memo[word] = v
            return v

        for pdf in batches:
            out = {"doc_id": [], "n_tokens": [], "nll": [], "ppl": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                tot, k = 0.0, 0
                for w in (text or "").split():
                    nl, kk = score(w)
                    tot += nl
                    k += kk
                nll = tot / k if k else 0.0
                out["doc_id"].append(int(doc_id))
                out["n_tokens"].append(k)
                out["nll"].append(round(nll, 6))
                out["ppl"].append(round(math.exp(min(nll, 700.0)), 6))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        emit, "doc_id long, n_tokens long, nll double, ppl double"
    )


def docs_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, avg_nll, max_ppl): per-language perplexity report
    under the corpus-trained unigram LM (NO_SQL: driver EM; pinned by
    bit-exact plain-Python replay). One encode-shaped corpus pass + a
    language-cardinality aggregate."""
    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    logp = _corpus_table(spark, sf_dir, d)
    s = unigram_doc_scores(d, logp)
    return (
        d.select("doc_id", "lang")
        .join(s, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.max("ppl"), 6).alias("max_ppl"),
        )
    )


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES = {
    "docs_unigram_tokens": docs_unigram_tokens,
    "docs_unigram_perplexity": docs_unigram_perplexity,
}
