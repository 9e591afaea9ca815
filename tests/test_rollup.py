"""Continuous-aggregate maintenance: incremental day refresh must leave the
rollup identical to a full rematerialization (dynamic partition overwrite
touches only the listed days), and the csv multiline option must parse
quoted embedded newlines."""

from __future__ import annotations

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators import rollup as R
from lithops_dataframe_spark.sources.csv import read_csv

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_incremental_refresh_equals_full(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup")
    R.materialize_rollup(events, path)
    full = _rows(spark.read.parquet(path).drop("day_part"))

    # corrupt two days by rewriting them from a half sample, then refresh
    days = ["2024-01-03", "2024-01-07"]
    half = events.filter(
        ~F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").isin(days)
        | (F.col("event_id") % 2 == 0)
    )
    R.refresh_days(half, path, days)
    assert _rows(spark.read.parquet(path).drop("day_part")) != full

    R.refresh_days(events, path, days)
    assert _rows(spark.read.parquet(path).drop("day_part")) == full


def test_query_with_tail_midday_cutoff_no_double_count(spark, tmp_path):
    """A cutoff that is NOT day-aligned must still equal a full recompute:
    the merge splits at date_trunc('day', cutoff), never keeping a day's
    materialized partial AND re-aggregating part of that day from raw."""
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup_mid")
    R.materialize_rollup(events, path)
    merged = R.query_with_tail(spark, path, events, "2024-01-25 13:45:00")
    full = R.daily_rollup(events).select(
        "day",
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )
    assert _rows(merged) == _rows(full)


def test_read_csv_multiline(spark, tmp_path):
    p = tmp_path / "ml.csv"
    p.write_text('id,notes\n1,"line one\nline two"\n2,plain\n')
    df = read_csv(spark, str(p), multiline=True)
    rows = {r["id"]: r["notes"] for r in df.collect()}
    assert rows == {1: "line one\nline two", 2: "plain"}
