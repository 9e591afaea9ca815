"""Direct invariants for the round-12 addition (Fleiss' kappa), on
crafted corpora with hand-computable answers — the oracle gate proves
engine parity; these pin the STATISTIC itself against the textbook
definition (Fleiss 1971, binary categories, k = 3 raters)."""

from __future__ import annotations

import pytest

from lithops_dataframe_spark.plans import QUERIES

from tests.test_round11_additions import _doc_for, _mini_docs_dir


def _brute_fleiss(ratings) -> float | None:
    """Textbook Fleiss' kappa over binary categories for k raters:
    P_i from per-doc category counts, P_bar their mean, P_e from the
    marginal category shares."""
    k = 3
    n = len(ratings)
    L = [sum(r) for r in ratings]
    p_bar = sum(l * (l - 1) + (k - l) * (k - l - 1) for l in L) / (n * k * (k - 1))
    p1 = sum(L) / (n * k)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    if 1 - p_e == 0:
        return None
    return (p_bar - p_e) / (1 - p_e)


def test_fleiss_kappa_textbook_value(spark, tmp_path):
    """Hand-computed: L=(3,1,0,2,2), N=8, sum L^2=18, n=5 ->
    P_bar = 18/30 = 0.6, P_e = (64+49)/225, kappa = 44/224 ~ 0.196."""
    ratings = [(1, 1, 1), (0, 1, 0), (0, 0, 0), (1, 0, 1), (0, 1, 1)]
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_fleiss_kappa"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert (r["pass_a"], r["pass_b"], r["pass_c"]) == (2, 3, 3)
    assert r["kappa_permille"] == round(1000 * 44 / 224)
    assert r["kappa_permille"] == round(1000 * _brute_fleiss(ratings))


def test_fleiss_kappa_single_category_null(spark, tmp_path):
    """Every rating in one category (P_e = 1): chance correction is
    undefined -> NULL, even though observed agreement is perfect."""
    ratings = [(1, 1, 1), (1, 1, 1)]
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_fleiss_kappa"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert r["kappa_permille"] is None
    assert _brute_fleiss(ratings) is None


def test_fleiss_kappa_perfect_agreement(spark, tmp_path):
    """Unanimous per doc but BOTH categories used: kappa = 1 exactly."""
    ratings = [(1, 1, 1), (0, 0, 0)]
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_fleiss_kappa"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    assert r["kappa_permille"] == 1000
    assert _brute_fleiss(ratings) == pytest.approx(1.0)


@pytest.mark.parametrize(
    "ratings",
    [
        [(1, 0, 0), (0, 1, 0), (0, 0, 1)],
        [(1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1), (0, 0, 0), (1, 0, 0)],
        [(0, 1, 1)] * 4 + [(1, 1, 1)] * 2,
        [(1, 0, 1)] * 3 + [(0, 1, 0)] * 3 + [(1, 1, 1)],
    ],
)
def test_fleiss_kappa_brute_force(spark, tmp_path, ratings):
    rows = [_doc_for(*r, i) for i, r in enumerate(ratings)]
    r = QUERIES["eval_fleiss_kappa"](spark, _mini_docs_dir(tmp_path, rows)).collect()[
        0
    ].asDict()
    expect = _brute_fleiss(ratings)
    assert r["kappa_permille"] == (None if expect is None else round(1000 * expect))
