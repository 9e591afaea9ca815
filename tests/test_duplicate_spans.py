"""Unit tests for operators/dedup.py::duplicate_span_stats — constructed
cases for the region-merge semantics (overlap, adjacency, intra-doc
duplication, collision-proof verification) that the oracle hash-gate only
exercises statistically."""

from __future__ import annotations

from lithops_dataframe_spark.operators.dedup import duplicate_span_stats


def _stats(spark, rows, k=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_span_stats(df, k=k).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_cross_doc_span_and_merge(spark):
    # docs 1/2 share "a b c d" → two overlapping 3-gram spans per doc that
    # must merge into ONE region of 4 words.
    shared = "a b c d"
    rows = [
        (1, f"x1 y1 {shared} z1"),
        (2, f"{shared} q1 q2 q3"),
        (3, "u1 u2 u3 u4 u5 u6"),
    ]
    s = _stats(spark, rows)
    assert set(s) == {1, 2}
    assert s[1]["n_regions"] == 1 and s[1]["dup_words"] == 4
    assert s[2]["n_regions"] == 1 and s[2]["dup_words"] == 4
    assert s[1]["longest_region"] == 4
    assert s[1]["total_words"] == 7
    assert s[1]["dup_permille"] == 4000 // 7


def test_adjacent_regions_merge(spark):
    # "a b c" duplicated and "d e f" duplicated, adjacent in doc 1
    # ("a b c d e f") but NOT overlapping as k-gram spans ([1,3] and [4,6])
    # — adjacency must still merge into one 6-word region.
    rows = [
        (1, "a b c d e f"),
        (2, "a b c p q r"),
        (3, "s t u d e f"),
    ]
    s = _stats(spark, rows)
    assert s[1]["n_regions"] == 1
    assert s[1]["dup_words"] == 6 and s[1]["longest_region"] == 6
    assert s[2]["dup_words"] == 3 and s[3]["dup_words"] == 3


def test_disjoint_regions_stay_separate(spark):
    rows = [
        (1, "a b c x1 x2 d e f"),
        (2, "a b c y1 y2 y3 y4"),
        (3, "z1 z2 z3 z4 d e f"),
    ]
    s = _stats(spark, rows)
    assert s[1]["n_regions"] == 2
    assert s[1]["dup_words"] == 6 and s[1]["longest_region"] == 3


def test_intra_doc_repeat_counts_as_duplicate(spark):
    # the 3-gram "a b c" appears twice inside ONE doc — still duplicated.
    rows = [(1, "a b c q1 q2 a b c"), (2, "m1 m2 m3 m4 m5")]
    s = _stats(spark, rows)
    assert set(s) == {1}
    assert s[1]["n_regions"] == 2 and s[1]["dup_words"] == 6


def test_short_docs_skipped(spark):
    rows = [(1, "a b"), (2, "a b"), (3, "a b c d")]
    s = _stats(spark, rows)  # docs 1/2 have < k words → no grams at all
    assert s == {}
