"""Row-wise frozen-LM serving: the stateless projection path equals the
join path at the shared 6dp round for BOTH smoothings, streams a replayed
document feed to the exact batch scores at any chunking, and the
count-table size gate raises actionably."""

import pytest
from pyspark.sql import functions as F

from artan_spark.plans.lm import persist_lm, score_rowwise_with_lm, score_with_lm
from artan_spark.sources import read_table_wide
from artan_spark.streaming.harness import stream_transform

from conftest import SF_DIR


def _docs(spark):
    return read_table_wide(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )


@pytest.mark.parametrize("smoothing", ["kn", "sb"])
def test_rowwise_equals_join_path(spark, tmp_path, smoothing):
    d = _docs(spark)
    md = str(tmp_path / "lm")
    persist_lm(spark, md, d)
    join_path = {r.doc_id: r for r in score_with_lm(spark, md, d, smoothing).collect()}
    rowwise = {r.doc_id: r for r in score_rowwise_with_lm(spark, md, d, smoothing).collect()}
    assert join_path.keys() == rowwise.keys()
    for i in join_path:
        assert rowwise[i].n_tokens == join_path[i].n_tokens, (smoothing, i)
        assert rowwise[i].ppl == join_path[i].ppl, (smoothing, i)
        assert rowwise[i].source == join_path[i].source


def test_rowwise_serves_a_stream(spark, tmp_path):
    d = _docs(spark).filter(F.col("doc_id") < 60)
    md = str(tmp_path / "lm")
    persist_lm(spark, md, _docs(spark))
    batch = sorted(
        tuple(r) for r in score_rowwise_with_lm(spark, md, d, "kn").collect()
    )
    for chunk_rows in (25, 60):
        streamed = stream_transform(
            spark,
            d,
            lambda sdf: score_rowwise_with_lm(spark, md, sdf, "kn"),
            chunk_rows=chunk_rows,
        )
        assert sorted(tuple(r) for r in streamed.collect()) == batch, chunk_rows


def test_rowwise_size_gate(spark, tmp_path):
    d = _docs(spark)
    md = str(tmp_path / "lm")
    persist_lm(spark, md, d)
    with pytest.raises(ValueError, match="table_limit"):
        score_rowwise_with_lm(spark, md, d, "kn", table_limit=1)


def test_py_tokens_jvm_parity(spark):
    """_py_tokens bit-matches F.split(F.trim(text), r'\\s+') on exotic
    whitespace: NBSP/U+2028/U+3000/\\x1c-\\x1f are NOT separators in the
    JVM (ASCII \\s, unlike Python's Unicode \\s), trim strips only 0x20,
    and leading/trailing ASCII separators yield empty elements."""
    from artan_spark.plans.lm import _py_tokens

    cases = [
        "a b  c",
        " a b ",
        " a b c",        # NBSP + line separator: kept in tokens
        "\x1c\x1d x \x1e\x1f",     # file/group/record/unit separators: kept
        "\ta\x0bb\x0cc\r\nd",      # leading tab -> empty first element
        "\x01ctrl\x02 y \x00",     # control chars + NUL survive trim
        "",
        "   ",
        "　wide　",        # ideographic space: not a separator
        "a b\t",                   # trailing separator -> empty last element
        "a\t\t",
        "\t",
        "a b \t ",
        "x\r\n",
        None,
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, t string"
    )
    jvm = {
        r["i"]: r["s"]
        for r in df.select(
            "i", F.split(F.trim("t"), r"\s+").alias("s")
        ).collect()
    }
    for i, c in enumerate(cases):
        expect = jvm[i] if jvm[i] is not None else [""]
        assert _py_tokens(c) == expect, (i, repr(c), jvm[i])


def test_kn_empty_bigram_table_raises(spark, tmp_path):
    """A reference corpus of only single-token docs persists an empty
    bigram table; the KN row-wise path must fail fast on the driver with
    an actionable error instead of ZeroDivisionError in every executor."""
    d = spark.createDataFrame(
        [(i, "ref", "solo") for i in range(5)], "doc_id long, source string, text string"
    )
    md = str(tmp_path / "lm1tok")
    persist_lm(spark, md, d)
    with pytest.raises(ValueError, match="empty bigram table"):
        score_rowwise_with_lm(spark, md, d, "kn")
