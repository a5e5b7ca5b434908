"""Persisted DSIR tables: frozen-table batch scoring reproduces the inline
dsir_select weights on the fit corpus, stays frozen across calls, and
handles unseen vocabulary via the smoothed fallback."""

import pyspark.sql.functions as F

from artan_spark.plans.dsir import dsir_score_batch, dsir_select, persist_dsir_tables
from artan_spark.sources import read_table_wide

from conftest import SF_DIR


def _docs(spark):
    return read_table_wide(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )


def test_stored_scoring_matches_inline(spark, tmp_path):
    d = _docs(spark)
    md = str(tmp_path / "dsir")
    persist_dsir_tables(spark, md, d)
    inline = {r.doc_id: r for r in dsir_select(d).collect()}
    stored = {r.doc_id: r for r in dsir_score_batch(spark, md, d).collect()}
    assert set(inline) == set(stored)
    for i in inline:
        assert stored[i].logw == inline[i].logw, i
        assert stored[i].score == inline[i].score, i


def test_frozen_tables_and_unseen_vocab(spark, tmp_path):
    d = _docs(spark)
    md = str(tmp_path / "dsir2")
    persist_dsir_tables(spark, md, d)
    novel = spark.createDataFrame(
        [(100000, "later", "xyzzy plugh qwop zzyzx"),
         (100001, "later", None)],
        "doc_id long, source string, text string",
    )
    a = {r.doc_id: r for r in dsir_score_batch(spark, md, novel).collect()}
    b = {r.doc_id: r for r in dsir_score_batch(spark, md, novel).collect()}
    assert a.keys() == b.keys()
    for i in a:
        assert a[i].asDict() == b[i].asDict()
    # unseen vocab scores via the smoothed zero-count ratio, finite
    import math

    assert math.isfinite(a[100000].logw) and math.isfinite(a[100000].score)
