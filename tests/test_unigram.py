"""Unigram-LM tokenizer: forward-backward E-step checked against
brute-force segmentation enumeration, Spark trainer replayed bit-exact in
plain Python (the BPE contract), Viterbi encode round-trips, and the id
stream composes with pack_token_ids."""

import math

import pytest

from artan_spark.plans.unigram import (
    MAX_PIECE_LEN,
    UNK,
    _e_step,
    train_unigram_from_counts,
    unigram_encode_ids,
    unigram_train,
    unigram_vocab,
    viterbi_segment,
    _unk_logp,
)

CORPUS = [
    (0, "abab abab cd cd abcd " * 4),
    (1, "ab cd abab abcd dcba"),
    (2, "aaaa bbbb abab cdcd"),
]


def _enumerate_expected(word, wc, logp):
    """Brute-force lattice expectations: enumerate EVERY segmentation."""
    segs = []

    def rec(i, acc):
        if i == len(word):
            segs.append(list(acc))
            return
        for j in range(i + 1, min(i + MAX_PIECE_LEN, len(word)) + 1):
            p = word[i:j]
            if p in logp:
                acc.append(p)
                rec(j, acc)
                acc.pop()

    rec(0, [])
    if not segs:
        return {}, None
    logps = [sum(logp[p] for p in s) for s in segs]
    m = max(logps)
    total = m + math.log(sum(math.exp(x - m) for x in logps))
    exp = {}
    for s, lp in zip(segs, logps):
        w = math.exp(lp - total) * wc
        for p in s:
            exp[p] = exp.get(p, 0.0) + w
    return exp, total


def test_e_step_matches_enumeration():
    logp = {
        "a": math.log(0.2), "b": math.log(0.2), "c": math.log(0.1),
        "d": math.log(0.1), "ab": math.log(0.25), "cd": math.log(0.1),
        "abab": math.log(0.05),
    }
    counts = [("abab", 3), ("abcd", 2), ("dcba", 1), ("aabb", 5)]
    got, ll = _e_step(counts, logp)
    want, want_ll = {}, 0.0
    for w, c in counts:
        e, tot = _enumerate_expected(w, c, logp)
        want_ll += c * tot
        for p, v in e.items():
            want[p] = want.get(p, 0.0) + v
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9), p
    assert ll == pytest.approx(want_ll, rel=1e-12)


def test_spark_trainer_replays_bit_exact(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    trained = unigram_train(docs, vocab_size=12)
    # plain-Python replay from plain-Python word counts
    wc: dict = {}
    for _i, text in CORPUS:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    replay = train_unigram_from_counts(sorted(wc.items()), vocab_size=12)
    assert trained == replay  # bit-exact: same pure function, same input
    assert len(trained) <= max(12, len({c for _, t in CORPUS for c in t if c != " "}))
    assert any(len(p) > 1 for p in trained)  # learned real subwords
    # determinism across invocations
    assert unigram_train(docs, vocab_size=12) == trained


def test_viterbi_segments_cover_and_score():
    logp = {"a": -2.0, "b": -2.0, "ab": -1.0, "abc": -0.5, "c": -3.0}
    unk = _unk_logp(logp)
    assert viterbi_segment("abc", logp, unk) == ["abc"]
    assert viterbi_segment("abab", logp, unk) == ["ab", "ab"]
    # unknown char segments alone and survives mid-word
    assert viterbi_segment("axb", logp, unk) == ["a", "x", "b"]
    # tie (a+b = -4 vs ab = -1): higher score wins
    assert viterbi_segment("ab", logp, unk) == ["ab"]
    # every segmentation concatenates back to the word
    for w in ("abcabc", "bca", "xyz"):
        assert "".join(viterbi_segment(w, logp, unk)) == w


def test_encode_ids_roundtrip_and_replay(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    logp = unigram_train(docs, vocab_size=12)
    vocab = unigram_vocab(logp)
    assert vocab[0] == UNK and len(vocab) == len(set(vocab))
    ids = {s: i for i, s in enumerate(vocab)}
    unk = _unk_logp(logp)

    out = {r.doc_id: r for r in unigram_encode_ids(docs, logp).collect()}
    assert set(out) == {0, 1, 2}
    for doc_id, text in CORPUS:
        expect = [
            ids.get(p, 0)
            for w in text.split()
            for p in viterbi_segment(w, logp, unk)
        ]
        assert list(out[doc_id].ids) == expect
        assert out[doc_id].n_tokens == len(expect)
    # decode: no unks in-corpus, so ids invert to the exact text words
    dec = "".join(vocab[i] for i in out[1].ids)
    assert dec == CORPUS[1][1].replace(" ", "")

    # unseen character -> <unk>=0
    weird = spark.createDataFrame([(9, "abq")], "doc_id long, text string")
    enc = unigram_encode_ids(weird, logp).collect()[0]
    assert 0 in list(enc.ids)


def test_composes_with_pack_token_ids(spark):
    from pyspark.sql import functions as F

    from artan_spark.plans.bpe import pack_token_ids

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    logp = unigram_train(docs, vocab_size=12)
    enc = unigram_encode_ids(docs, logp)
    total = enc.agg(F.sum("n_tokens")).collect()[0][0]
    packed = pack_token_ids(enc, seq_len=16, n_streams=2)
    packed_total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert packed_total == total


def test_docs_unigram_tokens_replay_sf001(spark):
    """The NO_SQL corpus entry replays bit-exact in plain Python (train
    input bounding + EM + Viterbi + per-lang aggregate), the
    docs_compression_ratio contract for non-SQL-expressible entries."""
    import pyarrow.parquet as pq

    from artan_spark.plans.unigram import (
        UNIGRAM_MIN_COUNT,
        UNIGRAM_TRAIN_WORDS,
        UNIGRAM_VOCAB,
        docs_unigram_tokens,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["lang"]: r for r in docs_unigram_tokens(spark, sf).collect()}

    t = pq.read_table(sf + "/documents.parquet").to_pydict()
    wc: dict = {}
    for text in t["text"]:
        for w in (text or "").split():
            wc[w] = wc.get(w, 0) + 1
    head = sorted(
        ((w, c) for w, c in wc.items() if c >= UNIGRAM_MIN_COUNT),
        key=lambda x: (-x[1], x[0]),
    )[:UNIGRAM_TRAIN_WORDS]
    logp = train_unigram_from_counts(head, vocab_size=UNIGRAM_VOCAB)
    unk = _unk_logp(logp)

    memo: dict = {}

    def n_toks(w):
        v = memo.get(w)
        if v is None:
            v = len(viterbi_segment(w, logp, unk))
            memo[w] = v
        return v

    agg: dict = {}
    for lang, text in zip(t["lang"], t["text"]):
        n = sum(n_toks(w) for w in (text or "").split())
        d = agg.setdefault(lang, [0, 0])
        d[0] += 1
        d[1] += n
    assert set(got) == set(agg)
    for lang, (n_docs, total) in agg.items():
        assert got[lang]["n_docs"] == n_docs
        assert got[lang]["total_tokens"] == total
        assert got[lang]["avg_tokens"] == pytest.approx(total / n_docs, abs=1e-6)


def test_unigram_vocab_dedups_literal_unk():
    """A corpus containing the literal string '<unk>' trains it as a piece
    (len 5 <= MAX_PIECE_LEN); the id table must stay a bijection (r9
    ADVICE found len(vocab) != len(set(vocab)) here — the bpe_vocab seen-set
    contract)."""
    logp = train_unigram_from_counts([("<unk>", 50), ("ab", 3)])
    assert UNK in logp  # the literal piece did train
    vocab = unigram_vocab(logp)
    assert len(vocab) == len(set(vocab))
    assert vocab[0] == UNK and vocab.count(UNK) == 1


def test_docs_unigram_perplexity_replay_sf001(spark):
    """docs_unigram_perplexity replays bit-exact in plain Python: same
    bounded train input, same EM, same Viterbi scores (both sides run
    Python float math), same per-doc 6dp rounding, then the per-lang
    aggregate — the docs_unigram_tokens replay contract."""
    import pyarrow.parquet as pq

    from artan_spark.plans.unigram import (
        UNIGRAM_MIN_COUNT,
        UNIGRAM_TRAIN_WORDS,
        UNIGRAM_VOCAB,
        docs_unigram_perplexity,
        viterbi_logp,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["lang"]: r for r in docs_unigram_perplexity(spark, sf).collect()}

    t = pq.read_table(sf + "/documents.parquet").to_pydict()
    wc: dict = {}
    for text in t["text"]:
        for w in (text or "").split():
            wc[w] = wc.get(w, 0) + 1
    head = sorted(
        ((w, c) for w, c in wc.items() if c >= UNIGRAM_MIN_COUNT),
        key=lambda x: (-x[1], x[0]),
    )[:UNIGRAM_TRAIN_WORDS]
    logp = train_unigram_from_counts(head, vocab_size=UNIGRAM_VOCAB)
    unk = _unk_logp(logp)

    memo: dict = {}

    def score(w):
        v = memo.get(w)
        if v is None:
            v = (-viterbi_logp(w, logp, unk), len(viterbi_segment(w, logp, unk)))
            memo[w] = v
        return v

    agg: dict = {}
    for lang, text in zip(t["lang"], t["text"]):
        tot, k = 0.0, 0
        for w in (text or "").split():
            nl, kk = score(w)
            tot += nl
            k += kk
        nll = round(tot / k, 6) if k else 0.0
        ppl = round(math.exp(min(tot / k if k else 0.0, 700.0)), 6)
        d = agg.setdefault(lang, [0, 0.0, 0.0])
        d[0] += 1
        d[1] += nll
        d[2] = max(d[2], ppl)
    assert set(got) == set(agg)
    for lang, (n_docs, nll_sum, max_ppl) in agg.items():
        assert got[lang]["n_docs"] == n_docs
        # per-doc values replay exactly (Python float math on both sides);
        # the engine's avg may sum in another order -> 1-ulp-at-6dp slack
        assert got[lang]["avg_nll"] == pytest.approx(nll_sum / n_docs, abs=2e-6)
        assert got[lang]["max_ppl"] == max_ppl  # max is order-independent
