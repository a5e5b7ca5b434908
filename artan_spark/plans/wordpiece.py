"""WordPiece tokenizer — the third tokenizer family major public models
train with (BERT lineage: Schuster & Nakajima 2012, "Japanese and Korean
voice search"; Devlin et al. 2019 BERT §A; the HuggingFace-tokenizers
WordPiece trainer), alongside BPE (``plans/bpe.py``) and the Unigram LM
(``plans/unigram.py``).

Trainer: BPE-shaped greedy merging, but the pair to merge maximizes the
LIKELIHOOD score ``count(ab) / (count(a) * count(b))`` instead of the raw
pair count — the published WordPiece objective (each merge maximizes the
training-data likelihood gain of a unigram LM over the pieces). Symbols
carry BERT's ``##`` continuation prefix from the start (word "abc" ->
["a", "##b", "##c"]), so merged pieces inherit word-initial vs
continuation identity exactly like the HF trainer's
``continuing_subword_prefix``.

Encoding is NOT merge-replay (that's BPE): WordPiece encodes by greedy
longest-match-first against the final vocabulary — BERT's
``WordpieceTokenizer`` algorithm — with whole-word ``[UNK]`` on any
unmatchable remainder and a max-word-length guard.

Scale architecture — the SAME split as BPE/Unigram, because the trainer's
input is the word-count aggregate, never the corpus:

1. **Word counting is the corpus-scale step** (``bpe.word_counts``: one
   scan, explode, hash-aggregate) — at 100 TB the only pass over text.
2. **Merging runs on the size-gated vocabulary aggregate** with
   deterministic tie-breaks (score desc, pair lexicographic asc), pair and
   symbol counts maintained incrementally per merge.
3. **Encoding is distributed again**: greedy longest-match under the
   (vocab-sized) broadcast piece set, Arrow-batched ``mapInPandas`` with a
   per-batch word memo — the ``bpe_encode_ids`` shape; the id stream
   composes with ``bpe.pack_token_ids`` unchanged.

Determinism contract (the BPE/Unigram replay bar): words sorted, counts
integer, score ties broken lexicographically, vocab = ``[UNK]`` + sorted
pieces — the trained tokenizer is a pure function of the corpus, replayed
bit-for-bit by plain Python in tests/test_wordpiece.py.

The reference engine has no tokenizer; beyond-reference surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from artan_spark.plans.bpe import word_counts
from artan_spark.sources import read_table_wide

UNK = "[UNK]"  # BERT's literal
CONT = "##"
MAX_WORD_CHARS = 100  # BERT guard: longer words encode straight to UNK


def _syms_of(word: str) -> tuple:
    return (word[0],) + tuple(CONT + ch for ch in word[1:])


def _merge_syms(a: str, b: str) -> str:
    return a + b[len(CONT):]


def _pairs(syms) -> dict:
    d: dict = {}
    for p in zip(syms, syms[1:]):
        d[p] = d.get(p, 0) + 1
    return d


def train_wordpiece_from_counts(
    counts: list[tuple[str, int]], n_merges: int
) -> list[str]:
    """Likelihood-scored greedy merging on a (word, count) list — the pure
    function shared by the Spark trainer and the test replay. Returns the
    sorted piece vocabulary (WITHOUT the [UNK] slot; see
    ``wordpiece_vocab``): the initial alphabet (both word-initial and
    ``##`` continuation forms) plus every merge product."""
    counts = sorted((w, c) for w, c in counts if w)
    words = [_syms_of(w) for w, _ in counts]
    wcounts = [c for _, c in counts]
    stats: dict = {}  # pair -> count-weighted occurrences
    sym: dict = {}  # symbol -> count-weighted occurrences
    index: dict = {}  # pair -> {word idx}
    for wi, syms in enumerate(words):
        c = wcounts[wi]
        for s in syms:
            sym[s] = sym.get(s, 0) + c
        for p, k in _pairs(syms).items():
            stats[p] = stats.get(p, 0) + k * c
            index.setdefault(p, set()).add(wi)
    pieces = set(sym)
    for _ in range(n_merges):
        live = {p: c for p, c in stats.items() if c > 0}
        if not live:
            break
        # deterministic argmax of count(ab)/(count(a)*count(b)): compare
        # as exact integer cross-products (no float division), then
        # lexicographic pair tie-break
        best = None
        bn = bd = None  # best score as a fraction bn/bd
        for p in sorted(live):
            n, d = live[p], sym[p[0]] * sym[p[1]]
            if best is None or n * bd > bn * d:
                best, bn, bd = p, n, d
        a, b = best
        ab = _merge_syms(a, b)
        pieces.add(ab)
        for wi in sorted(index.get(best, ())):
            syms = words[wi]
            c = wcounts[wi]
            old_pairs = _pairs(syms)
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            words[wi] = new_syms
            n_merged = (len(syms) - len(new_syms))
            sym[a] = sym.get(a, 0) - n_merged * c
            sym[b] = sym.get(b, 0) - n_merged * c
            sym[ab] = sym.get(ab, 0) + n_merged * c
            new_pairs = _pairs(new_syms)
            for p, k in old_pairs.items():
                stats[p] = stats.get(p, 0) - k * c
                if p not in new_pairs:
                    s = index.get(p)
                    if s is not None:
                        s.discard(wi)
            for p, k in new_pairs.items():
                stats[p] = stats.get(p, 0) + k * c
                index.setdefault(p, set()).add(wi)
        index.pop(best, None)
        stats.pop(best, None)
    return sorted(pieces)


def wordpiece_vocab(pieces: list[str]) -> list[str]:
    """Deterministic id table: ``[UNK]`` + sorted pieces, deduped against
    a literal corpus "[UNK]" piece (the bpe_vocab/unigram_vocab seen-set
    contract) — index IS the token id."""
    vocab = [UNK] + sorted(p for p in set(pieces) if p != UNK)
    assert len(vocab) == len(set(vocab))
    return vocab


def encode_word(word: str, piece_set: set) -> list[str]:
    """BERT WordpieceTokenizer: greedy longest-match-first; any
    unmatchable remainder (or an over-long word) collapses the WHOLE word
    to [UNK] — the published semantics, not per-char fallback."""
    if not word or len(word) > MAX_WORD_CHARS:
        return [UNK]
    out = []
    i = 0
    n = len(word)
    while i < n:
        end = n
        cur = None
        while end > i:
            piece = word[i:end]
            if i > 0:
                piece = CONT + piece
            if piece in piece_set:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        out.append(cur)
        i = end
    return out


def wordpiece_train(
    docs: DataFrame,
    n_merges: int = 200,
    max_vocab_rows: int = 2_000_000,
    min_count: int = 1,
    max_train_words: int | None = None,
) -> list[str]:
    """Learn a WordPiece vocabulary from a (text) corpus frame: ONE
    distributed word-count pass, then the size-gated merge loop on the
    aggregate. ``min_count`` / ``max_train_words`` bound the trainer input
    exactly like ``unigram_train`` (deterministic head TakeOrdered)."""
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
                "raise the gate, set max_train_words, or pre-truncate"
            )
    counts = [(r["word"], int(r["count"])) for r in wc.collect()]
    return train_wordpiece_from_counts(counts, n_merges)


def wordpiece_encode_ids(docs: DataFrame, pieces: list[str]) -> DataFrame:
    """(doc_id, text) -> (doc_id, ids array<int>, n_tokens): greedy
    longest-match encoding to token ids — Arrow-batched ``mapInPandas``,
    piece set shipped by value (vocab-sized), per-batch word memo.
    Output contract matches ``bpe_encode_ids`` so ``pack_token_ids``
    composes unchanged."""
    vocab = wordpiece_vocab(pieces)
    ids = {s: i for i, s in enumerate(vocab)}
    piece_set = set(pieces)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def word_ids(word):
            v = memo.get(word)
            if v is None:
                v = [ids.get(s, 0) for s in encode_word(word, piece_set)]
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


# -- corpus entry ------------------------------------------------------------

WP_MERGES = 96
WP_MIN_COUNT = 2
WP_TRAIN_WORDS = 2048

# session memo per (applicationId, documents path, freshness token) — the
# unigram._TRAIN_CACHE contract
_TRAIN_CACHE: dict[tuple, list] = {}


def _corpus_pieces(spark: SparkSession, sf_dir: str, d: DataFrame) -> list[str]:
    import os

    from artan_spark.plans.simsearch import _evict_stale
    from artan_spark.sources import _path_token

    path = os.path.join(sf_dir, "documents.parquet")
    key = (spark.sparkContext.applicationId, path, _path_token(path))
    hit = _TRAIN_CACHE.get(key)
    if hit is None:
        hit = wordpiece_train(
            d, n_merges=WP_MERGES, min_count=WP_MIN_COUNT, max_train_words=WP_TRAIN_WORDS
        )
        _evict_stale(_TRAIN_CACHE, key)
        _TRAIN_CACHE[key] = hit
    return hit


def docs_wordpiece_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, total_tokens, avg_tokens, unk_rate): the corpus
    tokenized under a WordPiece vocabulary trained on the corpus itself —
    the ``docs_unigram_tokens`` report shape plus the UNK rate (WordPiece's
    whole-word-UNK semantics make it the quality signal BERT pipelines
    watch).

    NO_SQL entry: the likelihood-scored merge loop has no SQL expression;
    correctness is pinned by a bit-exact plain-Python replay in
    tests/test_wordpiece.py (the docs_unigram_tokens contract).

    100-TB shape: one distributed word-count pass bounded to the top
    ``WP_TRAIN_WORDS`` head, one Arrow mapInPandas encode pass, one
    language-cardinality aggregate."""
    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pieces = _corpus_pieces(spark, sf_dir, d)
    enc = wordpiece_encode_ids(d, pieces)
    unks = F.size(F.filter("ids", lambda x: x == F.lit(0)))
    per_doc = enc.select("doc_id", "n_tokens", unks.alias("n_unk"))
    return (
        d.select("doc_id", "lang")
        .join(per_doc, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.round(F.sum("n_unk") / F.sum("n_tokens"), 6).alias("unk_rate"),
        )
    )


QUERIES: dict = {}
ORACLES: dict = {}
PYTEST_ORACLES: dict = {}
NO_SQL_QUERIES = {
    "docs_wordpiece_tokens": docs_wordpiece_tokens,
}
