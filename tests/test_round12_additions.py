"""Direct invariants for the round-12 additions: Fleiss' kappa (crafted
corpora with hand-computable answers — the oracle gate proves engine
parity; these pin the STATISTIC against the textbook definition, Fleiss
1971, binary categories, k = 3 raters) and the non-finite data policy
(events.value NaN/±Inf → NULL at load; non-finite vectors excluded from
vector ops)."""

from __future__ import annotations

import math

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


# --- non-finite data policy (r12 edge class) ---


def test_events_load_maps_nonfinite_value_to_null(spark, tmp_path):
    """Table contract: load_table('events') maps NaN/±Inf value to NULL
    (missing measurement) while keeping finite values and true NULLs —
    the engine half of the policy; the oracle half is the shadowing CTE
    every events oracle gets in plans/registry.py."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lithops_dataframe_spark.catalog import load_table

    ts = datetime.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([ts] * 5, pa.timestamp("us")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array(
                [1.5, float("nan"), float("inf"), float("-inf"), None],
                pa.float64(),
            ),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = {
        r["event_id"]: r["value"]
        for r in load_table(spark, str(tmp_path), "events").collect()
    }
    assert got == {1: 1.5, 2: None, 3: None, 4: None, 5: None}


def test_finite_vectors_excludes_nonfinite_rows(spark):
    """Vector hygiene gate: rows whose embedding carries any NaN/±Inf
    component are excluded; clean rows (including zero vectors, which the
    cosine NULL-guard handles separately) pass through."""
    from lithops_dataframe_spark.operators.similarity import finite_vectors

    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [0.0, 0.0, 0.0]),  # zero-norm: hygiene gate keeps it
        (3, [1.0, float("nan"), 3.0]),
        (4, [float("inf"), 2.0, 3.0]),
        (5, [1.0, 2.0, float("-inf")]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = sorted(r["vec_id"] for r in finite_vectors(df).collect())
    assert kept == [1, 2]


def test_finite_or_null_expression(spark):
    from pyspark.sql import functions as F

    from lithops_dataframe_spark.operators.util import finite_or_null

    df = spark.createDataFrame(
        [(1.5,), (float("nan"),), (float("inf"),), (float("-inf"),), (None,)],
        "v double",
    )
    got = [r["o"] for r in df.select(finite_or_null("v").alias("o")).collect()]
    assert got[0] == 1.5 and got[1:] == [None, None, None, None]


def test_word_shingles_matches_python_reference(spark):
    """The r12 zip_with rewrite of word_shingles (linear in doc length)
    must produce byte-identical shingle sets to the straightforward
    Python definition, across the edge shapes: normal, short (< n),
    single-token, empty, NULL, and a long document."""
    from pyspark.sql import functions as F

    from lithops_dataframe_spark.functions import hashing as H

    texts = [
        "a b c d e",
        "one",
        "",
        None,
        "x y",
        " ".join(f"t{i}" for i in range(500)) + " repeat repeat repeat",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    def ref(t, n):
        if t is None:
            return None
        ws = t.split(" ")
        if len(ws) < n:
            return [" ".join(ws)]
        seen, out = set(), []
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i : i + n])
            if g not in seen:
                seen.add(g)
                out.append(g)
        return out

    for n in (2, 3):
        got = [
            r["sh"]
            for r in df.select(
                H.word_shingles(F.col("text"), n).alias("sh")
            ).collect()
        ]
        want = [ref(t, n) for t in texts]
        assert got == want, f"n={n}: {got} != {want}"
