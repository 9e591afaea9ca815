"""Regression tests for the three round-6 ADVICE findings:

1. ``events_coverage_report``: a user with exactly ONE event has only a
   NULL inter-event gap, so a bare ``sum(cast(gap >= k))`` returned NULL
   ``n_sessions`` where the oracle's ``SUM(CASE ... ELSE 0 END)`` says 1.
2. ``events_decayed_value``: the shift amount is now clamped to [0, 62]
   in both engines — events AFTER the scoring date (negative age) and
   events older than 62 weeks previously diverged (Spark shiftleft wraps
   mod 64; DuckDB errors on negative shifts / overflows differently).
3. ``asof_join`` tolerance dtype validation: incompatible tolerance/on
   combinations raise a clear ValueError at entry instead of an opaque
   Catalyst analysis error at execution.

The fixture tables (sf0.001-0.1) happen to contain none of these edge
rows, so these tests build a tiny events.parquet that does.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from lithops_dataframe_spark.operators.joins import asof_join
from lithops_dataframe_spark.plans import QUERIES, ORACLES

from tests.conftest import assert_df_equal


def _edge_events_dir(tmp_path) -> str:
    """events.parquet with: a single-event user (41), a user with events
    after the decay scoring date 2024-01-31 (42), and a user with an event
    ~80 weeks before it (43)."""
    ts = datetime.datetime
    rows = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4, 5],
            "ts": [
                ts(2024, 1, 10, 12, 0, 0),  # user 41: exactly one event
                ts(2024, 2, 15, 9, 0, 0),  # user 42: AFTER the asof date
                ts(2024, 1, 5, 8, 0, 0),
                ts(2022, 7, 1, 0, 0, 0),  # user 43: ~82 weeks before asof
                ts(2024, 1, 20, 10, 0, 0),
                ts(2024, 1, 20, 10, 5, 0),  # in-session gap for user 43
            ],
            "user_id": [41, 42, 42, 43, 43, 43],
            "event_type": ["view"] * 6,
            "value": [10.55, 20.25, 1.0, 7.77, 3.33, 2.22],
            "props": ['{"k": 1}'] * 6,
        }
    )
    rows.to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


@pytest.mark.parametrize("name", ["events_coverage_report", "events_decayed_value"])
def test_advice_edge_rows_match_oracle(name, spark, tmp_path):
    import duckdb

    d = _edge_events_dir(tmp_path)
    con = duckdb.connect()
    con.execute("SET threads=1")  # DuckDB 1.0.0 parallel-window race, see conftest.make_duck
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    result = QUERIES[name](spark, d)
    assert_df_equal(result, con.sql(ORACLES[name]))
    con.close()


def test_coverage_single_event_user_session_count(spark, tmp_path):
    d = _edge_events_dir(tmp_path)
    row = (
        QUERIES["events_coverage_report"](spark, d)
        .filter("user_id = 41")
        .collect()[0]
    )
    assert row["n_sessions"] == 1
    assert row["covered_us"] == 0 and row["span_us"] == 0


def test_decay_clamps_future_and_ancient_events(spark, tmp_path):
    d = _edge_events_dir(tmp_path)
    rows = {
        r["user_id"]: r
        for r in QUERIES["events_decayed_value"](spark, d).collect()
    }
    # user 42's future event decays at shift 0 (full value), not mod-64 garbage
    assert rows[42]["decayed_cents"] == 2025 + (100 >> 3)
    # user 43's 82-week-old event clamps to shift 62 → contributes 0
    assert rows[43]["decayed_cents"] == (333 >> 1) + (222 >> 1)


def test_asof_tolerance_dtype_validation(spark):
    ldt = spark.createDataFrame(
        pd.DataFrame({"t": [datetime.datetime(2024, 1, 1)], "lv": [1]})
    )
    rdt = spark.createDataFrame(
        pd.DataFrame({"t": [datetime.datetime(2024, 1, 1)], "rv": [2]})
    )
    lnum = spark.createDataFrame(pd.DataFrame({"t": [1.0], "lv": [1]}))
    rnum = spark.createDataFrame(pd.DataFrame({"t": [1.0], "rv": [2]}))
    lstr = spark.createDataFrame(pd.DataFrame({"t": ["a"], "lv": [1]}))
    rstr = spark.createDataFrame(pd.DataFrame({"t": ["a"], "rv": [2]}))

    with pytest.raises(ValueError, match="interval string"):
        asof_join(ldt, rdt, on="t", tolerance=5)
    with pytest.raises(ValueError, match="must be numeric"):
        asof_join(lnum, rnum, on="t", tolerance="5 minutes")
    with pytest.raises(ValueError, match="not supported"):
        asof_join(lstr, rstr, on="t", tolerance=1)
    # compatible combinations still pass validation (plans build lazily)
    asof_join(ldt, rdt, on="t", tolerance="15 minutes")
    asof_join(lnum, rnum, on="t", tolerance=1.5)
    # nearest goes through the same entry validation
    with pytest.raises(ValueError, match="interval string"):
        asof_join(ldt, rdt, on="t", direction="nearest", tolerance=5)
