"""Prefix-filtered (AllPairs/PPJoin) exact-Jaccard join: equivalence to
the full inverted-index join, losslessness of the pruning, and the
candidate-reduction claim that justifies the algorithm at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators import dedup as D

from tests.conftest import SF_SMOKE


def _pairs(df):
    return {(r.id_a, r.id_b): r.jaccard for r in df.collect()}


@pytest.mark.parametrize("threshold", [0.3, 0.4, 0.6])
def test_prefix_filter_matches_full_inverted_index(spark, threshold):
    """Same pair set and same jaccard values as the Σdf² full-postings
    join at every threshold — prefix filtering must be lossless."""
    docs = load_table(spark, SF_SMOKE, "documents")
    fast = _pairs(D.jaccard_prefix_filter_pairs(docs, "text", "doc_id", shingle_n=3, threshold=threshold))
    full = _pairs(D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=threshold))
    assert fast == full
    assert len(fast) > 0  # the fixture plants near-dups; a vacuous pass proves nothing


def test_prefix_postings_are_a_strict_subset(spark):
    """The candidate join's input (prefix postings) must be materially
    smaller than the full postings list — that reduction IS the
    algorithm's at-scale win (Σ df_prefix² ≪ Σ df²)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    threshold = 0.4
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.split("text", " "), i),
                    F.element_at(F.split("text", " "), i + 1),
                    F.element_at(F.split("text", " "), i + 2),
                ),
            )
        ).alias("sh"),
    )
    total_postings = sh.select(F.explode("sh")).count()
    # prefix length floor((1-t)n)+1 over n shingles → ≈ (1-t) of postings
    prefix_budget = sh.select(
        F.sum(F.floor(F.lit(1.0 - threshold) * F.size("sh")) + F.lit(1)).alias("p")
    ).collect()[0].p
    assert prefix_budget < 0.7 * total_postings


def test_prefix_filter_empty_and_single_token_docs(spark):
    """0-row input flows through; single-shingle docs pair only on exact
    shingle equality (jaccard 1.0 ≥ t)."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.lit(False))
    assert D.jaccard_prefix_filter_pairs(docs, "text", "doc_id", threshold=0.4).count() == 0

    rows = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")]
    tiny = spark.createDataFrame(rows, "doc_id long, text string")
    got = _pairs(D.jaccard_prefix_filter_pairs(tiny, "text", "doc_id", shingle_n=3, threshold=0.5))
    assert got == {(1, 2): 1.0}
