"""BPE tokenizer: deterministic training vs an independent reference,
encoding semantics, distributed-vs-local agreement, and the end-to-end
compression-ratio query on driver data."""

from __future__ import annotations

import pytest

from artan_spark.plans.bpe import (
    END,
    bpe_token_counts,
    bpe_tokens,
    bpe_train,
    docs_bpe_stats,
    encode_word,
    train_bpe_from_counts,
)


def _reference_bpe(counts, n_merges):
    """Textbook BPE trainer (Sennrich et al. 2016 pseudocode shape),
    written independently of the library implementation: full pair-stat
    recount every round, regex-free pair replacement."""
    vocab = {tuple(w) + (END,): c for w, c in counts}
    merges = []
    for _ in range(n_merges):
        stats = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
        if not stats:
            break
        best = min(p for p, c in stats.items() if c == max(stats.values()))
        merges.append(best)
        merged = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        vocab = merged
    return merges


COUNTS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("new", 2)]


def test_train_matches_independent_reference():
    got = train_bpe_from_counts(COUNTS, 12)
    want = _reference_bpe(COUNTS, 12)
    assert got == want
    assert len(got) == 12
    # the classic outcome on this corpus: 'est</w>' becomes one unit
    joined = {"".join(p) for p in got}
    assert any("est" in j for j in joined)


def test_encode_word_merge_order():
    merges = train_bpe_from_counts(COUNTS, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    # a trained word compresses; an unseen word falls back to characters
    assert len(encode_word("newest", ranks)) < len("newest") + 1
    assert encode_word("zq", {}) == ["z", "q", END]
    # every encoding ends with the end-of-word marker folded or trailing
    out = encode_word("lowest", ranks)
    assert "".join(out) == "lowest" + END


def test_spark_train_and_count(spark):
    rows = []
    for w, c in COUNTS:
        rows.extend((i + len(rows) * 100, w) for i in range(c))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=12)
    assert merges == train_bpe_from_counts(COUNTS, 12)

    counts = {r.doc_id: r.n_tokens for r in bpe_token_counts(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for doc_id, word in rows:
        assert counts[doc_id] == len(encode_word(word, ranks))

    toks = bpe_tokens(docs.limit(3), merges).collect()
    assert all(t.pos >= 0 for t in toks)
    by_doc = {}
    for t in toks:
        by_doc.setdefault(t.doc_id, []).append((t.pos, t.token))
    for doc_id, lst in by_doc.items():
        lst.sort()
        assert [p for p, _ in lst] == list(range(len(lst)))  # dense positions


def test_vocab_gate_raises(spark):
    docs = spark.createDataFrame([(i, f"w{i}") for i in range(50)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train(docs, n_merges=2, max_vocab_rows=10)


def test_docs_bpe_stats_on_driver_data(spark):
    out = {r.lang: r for r in docs_bpe_stats(spark, "/root/testdata/sf0.001", n_merges=60).collect()}
    assert len(out) >= 2
    for lang, r in out.items():
        # learned subwords always need >= 1 token per word (END-marked),
        # and 60 merges on a Zipfian corpus already compress below chars
        assert r.bpe_tokens >= r.ws_tokens
        assert 1.0 <= r.tokens_per_word < 8.0


def test_incremental_matches_reference_at_scale():
    """The incremental pair-count maintenance must stay exactly equal to
    the full-recount reference over a larger random vocabulary (ties,
    overlapping pairs, repeated-letter words all occur at this size)."""
    import random

    random.seed(1)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    counts = list(
        {
            "".join(random.choices(alphabet, k=random.randint(2, 12))): random.randint(1, 1000)
            for _ in range(2000)
        }.items()
    )
    assert train_bpe_from_counts(counts, 100) == _reference_bpe(counts, 100)


def test_bpe_encode_ids_roundtrip_and_replay(spark):
    """Token-ID encoding: (a) ids decode back to the original text through
    the vocab table (END-marker aware), (b) the distributed encode equals
    a plain-Python replay bit-for-bit, (c) characters unseen at training
    time encode to <unk>=0, (d) the id table is deterministic."""
    from artan_spark.plans.bpe import (
        END,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
        encode_word,
    )

    rows = [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(6)]
    rows += [(6, "pack my box with five dozen liquor jugs")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=40)
    vocab = bpe_vocab(docs, merges)
    assert vocab[0] == "<unk>" and END in vocab
    assert vocab == bpe_vocab(docs, merges)  # deterministic

    out = {r.doc_id: r for r in bpe_encode_ids(docs, merges, vocab).collect()}
    assert set(out) == set(range(7))

    # (b) replay in plain Python
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ids = {s: i for i, s in enumerate(vocab)}
    for doc_id, text in rows:
        expect = [ids[s] for w in text.split() for s in encode_word(w, ranks)]
        assert list(out[doc_id].ids) == expect
        assert out[doc_id].n_tokens == len(expect)

    # (a) decode: concatenate vocab strings, END marks word boundaries
    dec = "".join(vocab[i] for i in out[6].ids).replace(END, " ").strip()
    assert dec == rows[-1][1]

    # (c) unseen character -> <unk>
    weird = spark.createDataFrame([(0, "föx")], "doc_id long, text string")
    enc = bpe_encode_ids(weird, merges, vocab).collect()[0]
    assert 0 in list(enc.ids)


def test_bpe_vocab_is_bijection_under_merge_collisions(spark):
    """Two distinct merges can yield the same product string (('a','bc') and
    ('ab','c') both give 'abc'); the vocab must keep the first occurrence
    only so ids[vocab[i]] == i for every slot (embedding tables sized from
    len(vocab) must carry no dead rows)."""
    from artan_spark.plans.bpe import bpe_vocab

    docs = spark.createDataFrame([(0, "abc abc ab a")], "doc_id long, text string")
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc")]  # two make 'abc'
    vocab = bpe_vocab(docs, merges)
    assert len(vocab) == len(set(vocab))
    ids = {s: i for i, s in enumerate(vocab)}
    assert all(ids[s] == i for i, s in enumerate(vocab))
    assert vocab.count("abc") == 1


def test_pack_token_ids_replay(spark):
    """Packed sequences replay exactly: per stream, concatenating docs in
    doc_id order and cutting every seq_len reproduces each (seq_id, ids)
    bit-for-bit; every sequence is full except the stream's last; empty
    docs contribute nothing."""
    from artan_spark.plans.bpe import pack_token_ids
    from artan_spark.plans.sampling import _BUCKETS

    import hashlib

    def stream_of(doc_id, n_streams):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return (h % _BUCKETS) % n_streams

    rows = [(i, list(range(i * 100, i * 100 + (0 if i == 7 else 3 + (i * 7) % 11))))
            for i in range(20)]
    enc = spark.createDataFrame(rows, "doc_id long, ids array<int>")
    L, NS = 8, 3
    out = {(r.stream, r.seq_id): list(r.ids) for r in pack_token_ids(enc, seq_len=L, n_streams=NS).collect()}

    # plain-Python replay
    expect = {}
    for s in range(NS):
        cat = []
        for doc_id, ids in sorted(rows):
            if stream_of(doc_id, NS) == s:
                cat.extend(ids)
        for q in range(0, max(1, (len(cat) + L - 1) // L)):
            part = cat[q * L:(q + 1) * L]
            if part:
                expect[(s, q)] = part
    assert out == expect
    # all-but-last full per stream
    for s in range(NS):
        seqs = sorted(q for (ss, q) in out if ss == s)
        for q in seqs[:-1]:
            assert len(out[(s, q)]) == L
