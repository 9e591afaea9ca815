"""Direct invariants for the round-11 additions (McNemar's exact test,
Cochran's Q), on crafted corpora with hand-computable answers (the
oracle gate proves engine parity; these pin the STATISTICS themselves
against the textbook definitions)."""

from __future__ import annotations

import math
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


# Rater recipes (same as eval_rater_agreement):
#   A positive: >= 5 tokens AND distinct-token permille >= 600
#   B positive: no 2-grams, or duplicated-2-gram share <= 300 permille
_B_ONLY = "hi there"  # 2 toks -> A neg; single 2-gram -> B pos
_BOTH = "one two three four five six"  # A pos, B pos
_NEITHER = "x x x x x x"  # A neg (1/6 distinct), B neg (all dup 2-grams)


def _a_only_text() -> str:
    # A pos (>=5 tokens, >=600 permille distinct) but B NEG (dup-2-gram
    # share > 300 permille): 5x "a b" + a 14-token distinct chain.
    # Tokens: 24, distinct 16 -> 666 permille (A pos). 2-grams: 23 total
    # = ab x5, ba x4, bc, cd..op x13 -> 16 distinct, dup 7 -> 1000*7 =
    # 7000 > 300*23 = 6900 (B neg).
    return "a b a b a b a b a b c d e f g h i j k l m n o p"


def test_mcnemar_textbook_small_cells(spark, tmp_path):
    """b=1, c=5 -> chi2_cc = (|1-5|-1)^2/6 = 1.5; exact two-sided
    p = 2 * (C(6,0)+C(6,1)) / 2^6 = 14/64 = 0.21875."""
    rows = [(0, _a_only_text(), "en", "s", 17)]
    rows += [(i, _B_ONLY, "en", "s", 8) for i in range(1, 6)]
    rows += [(6, _BOTH, "en", "s", 27), (7, _NEITHER, "en", "s", 11)]
    out = QUERIES["eval_mcnemar_exact"](spark, _mini_docs_dir(tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["a_only"], r["b_only"]) == (1, 5)
    assert r["chi2_cc_permille"] == round(1000 * ((abs(1 - 5) - 1) ** 2) / 6)
    assert r["p_exact_micros"] == round(
        1_000_000 * 2 * (math.comb(6, 0) + math.comb(6, 1)) / 2**6
    )


def test_mcnemar_equal_cells_clamp(spark, tmp_path):
    """b == c: the continuity-corrected statistic clamps to 0 (not 1/n),
    and the doubled tail P(X <= b) can exceed 1 -> p clamps to 1e6."""
    rows = [(0, _a_only_text(), "en", "s", 17), (1, _B_ONLY, "en", "s", 8)]
    r = QUERIES["eval_mcnemar_exact"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert (r["a_only"], r["b_only"]) == (1, 1)
    assert r["chi2_cc_permille"] == 0
    # n=2, m=1: S = C(2,0)+C(2,1) = 3; 2S = 6 > 2^2 -> clamp to 1.0
    assert r["p_exact_micros"] == 1_000_000


def test_mcnemar_degenerate_and_null_text(spark, tmp_path):
    """No discordant pairs (n=0): both statistics NULL. NULL-text docs
    are excluded before the cells on both engines."""
    rows = [
        (0, _BOTH, "en", "s", 27),
        (1, _NEITHER, "en", "s", 11),
        (2, None, "en", "s", None),
    ]
    r = QUERIES["eval_mcnemar_exact"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert (r["a_only"], r["b_only"]) == (0, 0)
    assert r["chi2_cc_permille"] is None
    assert r["p_exact_micros"] is None


def test_mcnemar_matches_scipy_style_reference(spark, tmp_path):
    """b=0, c=9: p = 2 * C(9,0)/2^9 = 2/512; chi2_cc = 64/9. The exact
    tail for the one-sided extreme case, computed independently."""
    rows = [(i, _B_ONLY, "en", "s", 8) for i in range(9)]
    rows += [(9, _BOTH, "en", "s", 27)]
    r = QUERIES["eval_mcnemar_exact"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert (r["a_only"], r["b_only"]) == (0, 9)
    assert r["chi2_cc_permille"] == round(1000 * 64 / 9)
    assert r["p_exact_micros"] == round(1_000_000 * 2 / 512)


def _doc_for(a: int, bb: int, c: int, i: int):
    """Row with rater outcomes (A=quality, B=repetition, C=n_chars>=20)."""
    text = {(1, 1): _BOTH, (0, 1): _B_ONLY, (1, 0): _a_only_text(), (0, 0): _NEITHER}[
        (a, bb)
    ]
    return (i, text, "en", "s", 25 if c else 5)


def _brute_q(ratings) -> float | None:
    k = 3
    g = [sum(r[j] for r in ratings) for j in range(k)]
    n = sum(g)
    l2 = sum(sum(r) ** 2 for r in ratings)
    den = k * n - l2
    if den <= 0:
        return None
    return (k - 1) * (k * sum(x * x for x in g) - n * n) / den


def test_cochran_q_textbook_value(spark, tmp_path):
    """Hand-computed: G=(2,3,3), N=8, sum L^2 = 18 ->
    Q = 2*(3*22 - 64)/(24 - 18) = 4/6."""
    ratings = [(1, 1, 1), (0, 1, 0), (0, 0, 0), (1, 0, 1), (0, 1, 1)]
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_cochran_q"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert (r["pass_a"], r["pass_b"], r["pass_c"]) == (2, 3, 3)
    assert r["q_permille"] == round(1000 * 4 / 6)
    assert r["q_permille"] == round(1000 * _brute_q(ratings))


def test_cochran_q_unanimous_null(spark, tmp_path):
    """Raters unanimous on every doc (L_i in {0, k}) — zero disagreement
    mass, Q undefined -> NULL, even when the docs themselves differ."""
    ratings = [(1, 1, 1), (1, 1, 1), (0, 0, 0)]
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_cochran_q"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert r["q_permille"] is None
    assert _brute_q(ratings) is None


@pytest.mark.parametrize(
    "ratings",
    [
        [(1, 0, 0), (0, 1, 0), (0, 0, 1)],
        [(1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1), (0, 0, 0), (1, 0, 0)],
        [(0, 1, 1)] * 4 + [(1, 1, 1)] * 2,
    ],
)
def test_cochran_q_brute_force(spark, tmp_path, ratings):
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_cochran_q"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    expect = _brute_q(ratings)
    assert r["q_permille"] == (None if expect is None else round(1000 * expect))


@pytest.mark.parametrize("b,c", [(3, 7), (0, 12), (5, 5), (2, 2)])
def test_mcnemar_exact_tail_brute_force(spark, tmp_path, b, c):
    """The engine's folded binomial tail equals a brute-force
    sum over math.comb for assorted cell shapes."""
    rows = [(i, _a_only_text(), "en", "s", 17) for i in range(b)]
    rows += [(100 + i, _B_ONLY, "en", "s", 8) for i in range(c)]
    r = QUERIES["eval_mcnemar_exact"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert (r["a_only"], r["b_only"]) == (b, c)
    n, m = b + c, min(b, c)
    s = sum(math.comb(n, k) for k in range(m + 1))
    expect = round(1_000_000 * min(2 * s, 2**n) / 2**n)
    assert r["p_exact_micros"] == expect
