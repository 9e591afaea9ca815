"""Direct invariants for the round-10 additions, on crafted corpora with
hand-computable answers (the oracle gate proves engine parity; these pin
the STATISTICS themselves against textbook definitions)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from lithops_dataframe_spark.plans import QUERIES


def _mini_docs_dir(tmp_path, rows) -> str:
    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_rater_agreement_matches_textbook_kappa(spark, tmp_path):
    """Crafted docs with known rater outcomes; kappa/alpha from the query
    must equal the textbook float formulas computed independently."""
    rows = [
        # A pos (6 distinct tokens), B pos (no dup 2-grams)
        (0, "a b c d e f", "en", "s", 11),
        # A neg (1/6 distinct = 166permille), B neg (all "x x" dups)
        (1, "x x x x x x", "en", "s", 11),
        # A neg (2/6 distinct), B neg (5 2-grams, 2 distinct -> 600permille dup)
        (2, "p q p q p q", "en", "s", 11),
        # A neg (2 tokens < 5), B pos (single 2-gram, no dup)
        (3, "hi there", "en", "s", 8),
        # A pos, B pos again
        (4, "one two three four five six", "en", "s", 27),
    ]
    out = QUERIES["eval_rater_agreement"](
        spark, _mini_docs_dir(tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    a, b, c, d = r["both_pos"], r["a_only"], r["b_only"], r["both_neg"]
    assert (a, b, c, d) == (2, 0, 1, 2)
    n = a + b + c + d
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert r["kappa_permille"] == round(1000 * kappa)
    m = b + c
    n1, n0 = 2 * a + m, 2 * d + m
    alpha = 1 - m * (2 * n - 1) / (n0 * n1)
    assert r["alpha_permille"] == round(1000 * alpha)


def test_rater_agreement_degenerate_source_nulls(spark, tmp_path):
    """All docs rated identically by both raters: pe = 1 (kappa) and one
    label class empty (alpha) — both must emit NULL, not divide."""
    rows = [(i, "a b c d e f", "en", "s", 11) for i in range(3)]
    r = QUERIES["eval_rater_agreement"](
        spark, _mini_docs_dir(tmp_path, rows)
    ).collect()[0].asDict()
    assert (r["both_pos"], r["both_neg"]) == (3, 0)
    assert r["kappa_permille"] is None
    assert r["alpha_permille"] is None


@pytest.mark.parametrize(
    "counts,expected_permille",
    [
        ([5, 5, 5, 5], 0),  # perfectly even -> gini 0
        ([1, 1, 1, 97], 720),  # (2*394 - 5*100) / (4*100) = 0.72
    ],
)
def test_gini_known_values(spark, tmp_path, counts, expected_permille):
    rows = [
        (i, " ".join(["tok"] * k), "en", "s", 4 * k) for i, k in enumerate(counts)
    ]
    r = QUERIES["text_source_token_gini"](
        spark, _mini_docs_dir(tmp_path, rows)
    ).collect()[0].asDict()
    assert r["n_docs"] == len(counts)
    assert r["total_tokens"] == sum(counts)
    assert r["gini_permille"] == expected_permille


def test_gini_equals_mean_absolute_difference_form(spark, tmp_path):
    """Rank form vs the pairwise definition gini = mean|x_i-x_j|/(2*mean)
    — independent formulas, same number (to the permille grid)."""
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = [
        (i, " ".join(["w"] * k), "en", "s", 2 * k) for i, k in enumerate(counts)
    ]
    r = QUERIES["text_source_token_gini"](
        spark, _mini_docs_dir(tmp_path, rows)
    ).collect()[0].asDict()
    n, tot = len(counts), sum(counts)
    mad = sum(abs(x - y) for x in counts for y in counts) / n**2
    gini = mad / (2 * tot / n)
    assert r["gini_permille"] == round(1000 * gini)


def test_gini_null_text_counts_as_zero_tokens(spark, tmp_path):
    """NULL text must rank as t=0 on BOTH engines (code-review r10: a
    bare size() is NULL under ANSI — Spark ranks NULLs first, DuckDB's
    ordered list puts them last, corrupting every rank). Counts: NULL
    doc contributes n_docs but no token mass."""
    rows = [
        (0, None, "en", "s", None),
        (1, "a b", "en", "s", 3),
        (2, "a b c d", "en", "s", 7),
    ]
    r = QUERIES["text_source_token_gini"](
        spark, _mini_docs_dir(tmp_path, rows)
    ).collect()[0].asDict()
    assert r["n_docs"] == 3
    assert r["total_tokens"] == 6
    # sorted t = [0, 2, 4]: S = 0 + 2*2 + 3*4 = 16; (2*16 - 4*6)/(3*6)
    assert r["gini_permille"] == round(1000 * 8 / 18)
