"""Unit tests for operators/dedup.py::containment_pairs — the asymmetric
doc-in-doc semantics the oracle hash-gate exercises only statistically."""

from __future__ import annotations

from lithops_dataframe_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs


def _docs(spark):
    big = " ".join(f"w{i}" for i in range(40))
    small = " ".join(f"w{i}" for i in range(10, 16))  # fully inside big
    other = " ".join(f"z{i}" for i in range(20))
    return spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string"
    )


def test_containment_catches_doc_in_doc_where_jaccard_is_blind(spark):
    docs = _docs(spark)
    pairs = containment_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.6).collect()
    assert [(r["id_small"], r["id_big"], r["containment"]) for r in pairs] == [(2, 1, 1.0)]
    # symmetric Jaccard at the same threshold misses the pair entirely:
    # |∩| = 4 three-gram shingles, |∪| = 38 → J ≈ 0.105
    jac = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.6).collect()
    assert jac == []


def test_containment_direction_is_small_into_big(spark):
    docs = _docs(spark)
    pairs = containment_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.6).collect()
    (row,) = pairs
    assert row["id_small"] == 2 and row["id_big"] == 1
    assert row["common"] == 4  # 6 tokens → 4 distinct 3-gram shingles


def test_containment_layout_invariant(spark, sf_dir):
    from lithops_dataframe_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = containment_pairs(docs, "text", "doc_id").collect()
    b = containment_pairs(docs.repartition(11), "text", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
