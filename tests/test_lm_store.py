"""Frozen LM store: persisted count tables reproduce the inline scorers
bit-for-bit (the store path and the inline path share _sb_ppl/_kn_ppl
verbatim), daily batches score chunk-invariantly, and fully-unseen batches
hit the closed-form OOV floor."""

import pyspark.sql.functions as F

from artan_spark.plans.lm import (
    kn_perplexity_buckets,
    lm_perplexity_buckets,
    persist_lm,
    score_with_lm,
)
from artan_spark.sources import read_table_wide

from conftest import SF_DIR


def _docs(spark):
    return read_table_wide(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )


def test_stored_scoring_matches_inline(spark, tmp_path):
    d = _docs(spark)
    md = str(tmp_path / "lm")
    persist_lm(spark, md, d)
    for smoothing, inline_fn in (("kn", kn_perplexity_buckets), ("sb", lm_perplexity_buckets)):
        inline = {
            r.doc_id: r for r in inline_fn(d).select("doc_id", "ppl", "n_tokens").collect()
        }
        stored = {r.doc_id: r for r in score_with_lm(spark, md, d, smoothing).collect()}
        assert set(inline) == set(stored)
        for i in inline:
            assert stored[i].ppl == inline[i].ppl, (smoothing, i)
            assert stored[i].n_tokens == inline[i].n_tokens, (smoothing, i)


def test_stored_scoring_chunk_invariant(spark, tmp_path):
    d = _docs(spark)
    md = str(tmp_path / "lm")
    persist_lm(spark, md, d)
    whole = {r.doc_id: r for r in score_with_lm(spark, md, d, "kn").collect()}
    parts = {}
    for k in (0, 1):
        chunk = d.filter(F.col("doc_id") % 2 == k)
        parts.update({r.doc_id: r for r in score_with_lm(spark, md, chunk, "kn").collect()})
    assert whole.keys() == parts.keys()
    for i in whole:
        assert parts[i].asDict() == whole[i].asDict(), i


def test_unseen_batch_hits_oov_floor(spark, tmp_path):
    d = _docs(spark)
    md = str(tmp_path / "lm")
    persist_lm(spark, md, d)
    novel = spark.createDataFrame(
        [(200000, "later", "zzyzx qwop xyzzy")], "doc_id long, source string, text string"
    )
    # every token is OOV and every context unseen: p = oov_alpha / n1tot for
    # all three tokens under KN, so ppl == round(n1tot / oov_alpha, 6)
    n1tot = spark.read.parquet(md + "/bigrams").count()
    meta = spark.read.parquet(md + "/meta").first()
    row = score_with_lm(spark, md, novel, "kn").first()
    assert row.n_tokens == 3
    assert abs(row.ppl - n1tot / meta["oov_alpha"]) < 1e-4
    # store contents never change from being scored against
    assert spark.read.parquet(md + "/bigrams").count() == n1tot
