"""events_gapfill_daily's contract for a series with ZERO events: the
spine is a literal ('purchase','signup') frame, so a type entirely
absent from the window still gets its 30 explicit gap rows — and the
DuckDB oracle (literal VALUES spine since r5, ADVICE r4) agrees. The
shipped fixture always contains both types, so the full battery never
exercises this branch; this test builds a fixture WITHOUT 'signup'."""

from __future__ import annotations

import duckdb

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.funnel_q import _GAPFILL_ORACLE
from lithops_dataframe_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_gapfill_emits_full_gap_series_for_absent_type(spark, tmp_path):
    sf_dir = str(tmp_path)
    load_table(spark, SF_SMOKE, "events").filter(
        "event_type <> 'signup'"
    ).write.parquet(f"{sf_dir}/events.parquet")

    out = QUERIES["events_gapfill_daily"](spark, sf_dir).collect()
    signup = [r for r in out if r["event_type"] == "signup"]
    assert len(signup) == 30, "absent type must still get its 30 spine rows"
    assert all(r["gap_filled"] == 1 and r["n_events"] == 0 for r in signup)

    con = duckdb.connect()
    con.execute("SET threads=1")  # DuckDB 1.0.0 parallel-window race, see conftest.make_duck
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    oracle = con.execute(_GAPFILL_ORACLE).fetchall()
    assert len(oracle) == len(out) == 60
    o_signup = [r for r in oracle if r[1] == "signup"]
    assert len(o_signup) == 30, "oracle spine must also be literal (ADVICE r4)"
