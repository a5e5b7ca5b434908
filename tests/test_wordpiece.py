"""WordPiece tokenizer: likelihood-scored trainer replayed bit-exact in
plain Python (the BPE/Unigram contract), greedy longest-match encode with
whole-word [UNK], round-trip decode, pack_token_ids composition, and the
NO_SQL corpus entry replayed at sf0.001."""

import pytest

from artan_spark.plans.wordpiece import (
    CONT,
    MAX_WORD_CHARS,
    UNK,
    encode_word,
    train_wordpiece_from_counts,
    wordpiece_encode_ids,
    wordpiece_train,
    wordpiece_vocab,
)

CORPUS = [
    (0, "hugs hug hugging pug pugs bug bugs"),
    (1, "hug hug hugs pun puns fun"),
    (2, "bun buns pun hugging hugging"),
]


def test_likelihood_score_differs_from_raw_count():
    """The WordPiece objective count(ab)/(count(a)count(b)) must pick a
    RARE-symbol pair over a frequent-pair-of-frequent-symbols — the case
    that separates it from BPE. Here ('q','##z') occurs 3x with q,z
    appearing nowhere else (score 3/9); ('a','##b') occurs 8x but a,b are
    everywhere (score 8/(10*10)) — WordPiece merges qz first, BPE ab."""
    from artan_spark.plans.bpe import END, train_bpe_from_counts

    counts = [("ab", 8), ("qz", 3), ("ax", 2), ("yb", 2)]
    pieces = train_wordpiece_from_counts(counts, n_merges=1)
    assert "qz" in pieces and "ab" not in pieces
    # BPE's count objective picks the frequent pair on the same input
    assert train_bpe_from_counts(counts, 1)[0] == ("b", END)


def test_trainer_deterministic_and_prefix_semantics():
    counts = [("abc", 4), ("abd", 3), ("bcd", 2)]
    p1 = train_wordpiece_from_counts(counts, n_merges=3)
    p2 = train_wordpiece_from_counts(list(reversed(counts)), n_merges=3)
    assert p1 == p2  # input order invariant
    # alphabet carries both forms; merge products keep the word-initial /
    # continuation identity of their left symbol
    assert "a" in p1 and "##b" in p1 and "##c" in p1
    for piece in p1:
        if piece.startswith(CONT):
            assert len(piece) > len(CONT)


def test_encode_word_longest_match_and_unk():
    pieces = {"un", "##aff", "##able", "##ab", "a", "##f", "##l", "##e", "hug", "##s"}
    assert encode_word("unaffable", pieces) == ["un", "##aff", "##able"]
    assert encode_word("hugs", pieces) == ["hug", "##s"]
    # unmatchable remainder -> WHOLE word is [UNK] (BERT semantics)
    assert encode_word("unz", pieces) == [UNK]
    assert encode_word("", pieces) == [UNK]
    assert encode_word("x" * (MAX_WORD_CHARS + 1), {"x", "##x"}) == [UNK]


def test_spark_trainer_replays_bit_exact(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = wordpiece_train(docs, n_merges=10)

    wc: dict = {}
    for _i, text in CORPUS:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    want = train_wordpiece_from_counts(sorted(wc.items()), n_merges=10)
    assert got == want


def test_encode_ids_roundtrip_and_replay(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    pieces = wordpiece_train(docs, n_merges=10)
    vocab = wordpiece_vocab(pieces)
    piece_set = set(pieces)

    enc = {r.doc_id: r for r in wordpiece_encode_ids(docs, pieces).collect()}
    for doc_id, text in CORPUS:
        want = []
        ids = {s: i for i, s in enumerate(vocab)}
        for w in text.split():
            want.extend(ids.get(s, 0) for s in encode_word(w, piece_set))
        assert list(enc[doc_id].ids) == want
        assert enc[doc_id].n_tokens == len(want)
        # round-trip: strip ## and rejoin reconstructs the text (no UNKs
        # in-corpus — every char was seen in training)
        toks = [vocab[i] for i in enc[doc_id].ids]
        rebuilt = []
        for t in toks:
            assert t != UNK
            if t.startswith(CONT):
                rebuilt[-1] += t[len(CONT):]
            else:
                rebuilt.append(t)
        assert " ".join(rebuilt) == text


def test_composes_with_pack_token_ids(spark):
    import pyspark.sql.functions as F

    from artan_spark.plans.bpe import pack_token_ids

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    pieces = wordpiece_train(docs, n_merges=10)
    enc = wordpiece_encode_ids(docs, pieces)
    total = enc.agg(F.sum("n_tokens")).collect()[0][0]
    packed = pack_token_ids(enc, seq_len=16, n_streams=2)
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total


def test_docs_wordpiece_tokens_replay_sf001(spark):
    """The NO_SQL corpus entry replays bit-exact in plain Python (bounded
    train input + merges + greedy encode + per-lang aggregate) — the
    docs_unigram_tokens contract."""
    import pyarrow.parquet as pq

    from artan_spark.plans.wordpiece import (
        WP_MERGES,
        WP_MIN_COUNT,
        WP_TRAIN_WORDS,
        docs_wordpiece_tokens,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["lang"]: r for r in docs_wordpiece_tokens(spark, sf).collect()}

    t = pq.read_table(sf + "/documents.parquet").to_pydict()
    wc: dict = {}
    for text in t["text"]:
        for w in (text or "").split():
            wc[w] = wc.get(w, 0) + 1
    head = sorted(
        ((w, c) for w, c in wc.items() if c >= WP_MIN_COUNT),
        key=lambda x: (-x[1], x[0]),
    )[:WP_TRAIN_WORDS]
    pieces = train_wordpiece_from_counts(head, n_merges=WP_MERGES)
    piece_set = set(pieces)

    memo: dict = {}

    def toks(w):
        v = memo.get(w)
        if v is None:
            v = encode_word(w, piece_set)
            memo[w] = v
        return v

    agg: dict = {}
    for lang, text in zip(t["lang"], t["text"]):
        n = n_unk = 0
        for w in (text or "").split():
            ts = toks(w)
            n += len(ts)
            n_unk += sum(1 for x in ts if x == UNK)
        d = agg.setdefault(lang, [0, 0, 0])
        d[0] += 1
        d[1] += n
        d[2] += n_unk
    assert set(got) == set(agg)
    for lang, (n_docs, total, n_unk) in agg.items():
        assert got[lang]["n_docs"] == n_docs
        assert got[lang]["total_tokens"] == total
        assert got[lang]["avg_tokens"] == pytest.approx(total / n_docs, abs=1e-6)
        assert got[lang]["unk_rate"] == pytest.approx(n_unk / total, abs=1e-6)
