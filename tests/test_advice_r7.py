"""Regression tests for the two round-7 ADVICE findings:

1. ``dq_ks_value_drift``: a NULL ``ts`` made the Spark-side sample flag
   NULL (``(NULL < split).cast('int')`` → NULL) so the row silently left
   BOTH KS samples, while the oracle's ``CASE WHEN ... ELSE 0 END``
   counted it in sample B. Both engines now put NULL ts in sample B.
2. ``asof_join`` tolerance validation: ``'interval ...'`` dtypes were
   classified numeric by prefix matching ('interval'.startswith('int')),
   and ``tolerance=True`` passed ``isinstance(tolerance, (int, float))``.

The fixture tables contain no NULL ts / interval columns, so these tests
build the edge rows directly.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from lithops_dataframe_spark.operators.joins import asof_join
from lithops_dataframe_spark.plans import ORACLES, QUERIES

from tests.conftest import assert_df_equal


def _edge_events_dir(tmp_path) -> str:
    """events.parquet with NULL ts rows (one with a value, one with a NULL
    value) alongside normal pre/post-cutover rows around 2024-01-15."""
    ts = datetime.datetime
    rows = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4, 5],
            "ts": [
                ts(2024, 1, 10, 12, 0, 0),  # before the KS cutover → sample A
                ts(2024, 1, 20, 9, 0, 0),  # after → sample B
                None,  # NULL ts, real value → must land in sample B
                None,  # NULL ts AND NULL value → dropped entirely
                ts(2024, 1, 12, 8, 0, 0),
                ts(2024, 1, 25, 10, 0, 0),
            ],
            "user_id": [1, 1, 2, 2, 3, 3],
            "event_type": ["view"] * 6,
            "value": [10.5, 20.25, 7.75, None, 10.5, 7.75],
            "props": ['{"k": 1}'] * 6,
        }
    )
    rows.to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


def test_ks_null_ts_matches_oracle(spark, tmp_path):
    import duckdb

    d = _edge_events_dir(tmp_path)
    con = duckdb.connect()
    con.execute("SET threads=1")  # DuckDB 1.0.0 parallel-window race, see conftest.make_duck
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    assert_df_equal(QUERIES["dq_ks_value_drift"](spark, d), con.sql(ORACLES["dq_ks_value_drift"]))
    con.close()


def test_ks_null_ts_counts_in_sample_b(spark, tmp_path):
    d = _edge_events_dir(tmp_path)
    row = QUERIES["dq_ks_value_drift"](spark, d).collect()[0]
    # 3 non-NULL-value rows before the cutover? no: samples are A=pre-cutover
    # (2 rows), B=post-cutover (2 rows) + the NULL-ts valued row → n_b = 3.
    # The NULL-ts NULL-value row is in neither.
    assert row["n_a"] == 2
    assert row["n_b"] == 3


def test_asof_tolerance_interval_on_rejected(spark):
    l = spark.sql("SELECT INTERVAL '1' DAY AS t, 1 AS lv")
    r = spark.sql("SELECT INTERVAL '1' DAY AS t, 2 AS rv")
    assert dict(l.dtypes)["t"].startswith("interval")
    with pytest.raises(ValueError, match="not supported"):
        asof_join(l, r, on="t", tolerance=5)


def test_asof_tolerance_bool_rejected(spark):
    lnum = spark.createDataFrame(pd.DataFrame({"t": [1.0], "lv": [1]}))
    rnum = spark.createDataFrame(pd.DataFrame({"t": [1.0], "rv": [2]}))
    with pytest.raises(ValueError, match="must be numeric"):
        asof_join(lnum, rnum, on="t", tolerance=True)
    # real numerics still pass validation (plans build lazily)
    asof_join(lnum, rnum, on="t", tolerance=1.5)
