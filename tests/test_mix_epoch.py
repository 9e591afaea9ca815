"""Weighted-interleave epoch mixing: closed-form rank vs a naive
exact-rational sort, permutation/quota invariants, layout invariance."""

from __future__ import annotations

import hashlib
from fractions import Fraction
from math import isqrt

import pandas as pd

from lithops_dataframe_spark.catalog import load_table, table_path
from lithops_dataframe_spark.operators import sampling as SA

from tests.conftest import SF_SMOKE

BUDGET = 120


def _expected(pdf: pd.DataFrame) -> dict[int, tuple[str, int, int]]:
    """Pure-python replay: quotas, md5 pick order, exact-rational
    weighted-round-robin serve order (Fraction — no float anywhere)."""
    counts = pdf.groupby("source")["doc_id"].count().to_dict()
    w = {s: isqrt(n) for s, n in counts.items()}
    tw = sum(w.values())
    k = {s: min(counts[s], BUDGET * w[s] // tw) for s in counts}
    sel = []
    for s, g in pdf.groupby("source"):
        if k[s] < 1:
            continue
        ids = sorted(g["doc_id"], key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for r, doc in enumerate(ids[: k[s]], start=1):
            sel.append((Fraction(r, k[s]), s, doc, r))
    sel.sort(key=lambda t: (t[0], t[1]))
    return {doc: (s, r, pos) for pos, (_, s, doc, r) in enumerate(sel, start=1)}


def test_closed_form_rank_matches_exact_rational_sort(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        r.id: (r.source, r.r, r.epoch_pos)
        for r in SA.weighted_interleave_epoch(docs, "source", "doc_id", budget=BUDGET).collect()
    }
    expected = _expected(pd.read_parquet(table_path(SF_SMOKE, "documents")))
    assert got == expected


def test_epoch_positions_are_a_permutation_and_quotas_hold(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = SA.weighted_interleave_epoch(docs, "source", "doc_id", budget=BUDGET).collect()
    positions = sorted(r.epoch_pos for r in out)
    assert positions == list(range(1, len(out) + 1))  # total order, no gaps
    assert len(out) <= BUDGET
    # round-robin balance: any source's rows are spread, not clustered —
    # within the first half of the epoch every source with quota ≥ 2 has
    # served at least ⌊k/2⌋ rows
    half = len(out) // 2
    per_src_total: dict[str, int] = {}
    per_src_half: dict[str, int] = {}
    for r in out:
        per_src_total[r.source] = per_src_total.get(r.source, 0) + 1
        if r.epoch_pos <= half:
            per_src_half[r.source] = per_src_half.get(r.source, 0) + 1
    for s, k in per_src_total.items():
        if k >= 2:
            assert per_src_half.get(s, 0) >= k // 2 - 1


def test_mix_is_layout_invariant(spark):
    """Repartitioning the input must not change a single assignment —
    the op is RNG-free and order-free by construction."""
    docs = load_table(spark, SF_SMOKE, "documents")
    a = {
        r.id: (r.r, r.epoch_pos)
        for r in SA.weighted_interleave_epoch(docs, "source", "doc_id", budget=BUDGET).collect()
    }
    b = {
        r.id: (r.r, r.epoch_pos)
        for r in SA.weighted_interleave_epoch(
            docs.repartition(17), "source", "doc_id", budget=BUDGET
        ).collect()
    }
    assert a == b
