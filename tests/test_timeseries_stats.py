"""Seasonal decomposition + MAD anomaly stats: differential tests against
independent pandas/numpy computations and analytic edge cases."""

from __future__ import annotations

import collections
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table, table_path
from lithops_dataframe_spark.operators import timeseries as TS

from tests.conftest import SF_T2


@pytest.fixture(scope="module")
def events_pdf() -> pd.DataFrame:
    return pd.read_parquet(table_path(SF_T2, "events"))


def _round4(x: float) -> float:
    """Spark-identical ROUND(x, 4): HALF_UP over the shortest decimal
    representation (java BigDecimal.valueOf) — python's builtin round()
    uses the exact binary value and half-even, which diverges on
    systematic ties like odd_int/20000."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def test_seasonal_decompose_matches_pandas(spark, events_pdf):
    """Replicate the integer-exact decomposition independently in pandas:
    hourly cents, gap-aware 25-point centered sum on the hour index,
    phase means — must agree to the rounding digit."""
    pdf = events_pdf.copy()
    pdf["t"] = pdf["ts"].dt.floor("h").astype("datetime64[s]").astype("int64") // 3600
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    hourly = pdf.groupby(["event_type", "t"], as_index=False)["cents"].sum()

    expected = {}
    for ent, g in hourly.groupby("event_type"):
        by_t = dict(zip(g["t"], g["cents"]))
        acc = collections.defaultdict(list)
        for t, c in by_t.items():
            window = [by_t[u] for u in range(t - 12, t + 13) if u in by_t]
            if len(window) == 25:
                acc[int(t % 24)].append(25 * c - sum(window))
        for phase, detr in acc.items():
            expected[(ent, phase)] = (
                len(detr),
                _round4(sum(detr) / (2500.0 * len(detr))),
            )

    ev = load_table(spark, SF_T2, "events")
    got = {
        (r.event_type, r.phase): (r.n_obs, r.seasonal)
        for r in TS.seasonal_decompose(
            ev, entity_col="event_type", ts_col="ts", value_col="value"
        ).collect()
    }
    assert got == expected
    assert len(got) > 50  # dense fixture: most (type, phase) cells present


def test_mad_anomalies_match_numpy(spark, events_pdf):
    """Median/MAD/anomaly counts per user must equal numpy's linear-
    interpolation median over integer cents."""
    pdf = events_pdf.copy()
    pdf["c"] = (pdf["value"] * 100).round().astype("int64")
    expected = {}
    for uid, g in pdf.groupby("user_id"):
        c = g["c"].to_numpy()
        med = float(np.median(c))
        dev2 = np.abs(2 * c - int(2.0 * med))
        mad2 = float(np.median(dev2))
        expected[uid] = (
            len(c),
            _round4(med / 100),
            _round4(mad2 / 200),
            int((dev2 > 3.5 * mad2).sum()),
        )

    ev = load_table(spark, SF_T2, "events")
    got = {
        r.user_id: (r.n, r.med_value, r.mad_value, r.n_anom)
        for r in TS.mad_anomaly_stats(ev, entity_col="user_id", value_col="value").collect()
    }
    assert got == expected
    assert sum(v[3] for v in got.values()) > 0  # fixture has genuine outliers


def test_seasonal_constant_series_is_zero(spark):
    """A constant series has zero seasonal component at every phase, and
    edges (first/last 12 hours) are excluded from n_obs."""
    rows = [(f"2024-03-01 {h:02d}:30:00", "steady", 7.25) for h in range(24)]
    rows += [(f"2024-03-02 {h:02d}:30:00", "steady", 7.25) for h in range(24)]
    rows += [(f"2024-03-03 {h:02d}:30:00", "steady", 7.25) for h in range(24)]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = TS.seasonal_decompose(df, entity_col="event_type", ts_col="ts", value_col="value")
    got = {r.phase: (r.n_obs, r.seasonal) for r in out.collect()}
    # 72 hourly points − 12 edge points each side = 48 interior, 2 per phase
    assert got == {h: (2, 0.0) for h in range(24)}


def test_mad_constant_series_has_no_anomalies(spark):
    df = spark.createDataFrame(
        [(1, 5.0)] * 9 + [(1, 500.0), (2, 3.0), (2, 3.0), (2, 3.0)],
        "user_id long, value double",
    )
    got = {
        r.user_id: (r.n, r.med_value, r.mad_value, r.n_anom)
        for r in TS.mad_anomaly_stats(df, entity_col="user_id", value_col="value").collect()
    }
    # user 1: median 5.0, MAD 0 → the single 500.0 point is the anomaly
    assert got[1] == (10, 5.0, 0.0, 1)
    # user 2: constant → MAD 0, zero anomalies
    assert got[2] == (3, 3.0, 0.0, 0)
