"""corpus_diff NULL-text semantics: presence is an explicit flag, not
hash nullness — a doc present on both sides with NULL text is
'unchanged', a text transition to/from NULL is 'changed', and
added/removed still come only from actual row absence."""

from artan_spark.plans.diff import corpus_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_null_text_verdicts(spark):
    old = _df(
        spark,
        [
            (1, "a", None),      # NULL both sides -> unchanged
            (2, "a", "x"),       # x -> NULL        -> changed
            (3, "a", None),      # NULL -> y        -> changed
            (4, "a", "same"),    # same text        -> unchanged
            (5, "a", None),      # NULL, absent new -> removed
        ],
    )
    new = _df(
        spark,
        [
            (1, "a", None),
            (2, "a", None),
            (3, "a", "y"),
            (4, "a", "same"),
            (6, "a", None),      # NULL, absent old -> added
        ],
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "unchanged",
        5: "removed",
        6: "added",
    }
