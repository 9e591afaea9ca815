"""Shared pytest fixtures: one SparkSession per test session, DuckDB oracle
connections per scale factor, and the differential comparator."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from lithops_dataframe_spark.catalog import TABLES, table_path
from lithops_dataframe_spark.session import get_spark

SF_SMOKE = os.environ.get("LDS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lds-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB 1.0.0's MULTITHREADED window operator nondeterministically
    # splits a tiny window partition across hash groups (two rows can both
    # get row_number()=1, ~25% of runs on a 16-row input) — the root cause
    # of the VERDICT-r8 "order-dependent" battery flake on
    # test_edge_matches_oracle[events_ohlc_bars]. Single-threaded DuckDB
    # computes the same (correct) answers deterministically; the driver's
    # own multithreaded connection stays exercised via tools/driver_sim.py.
    con.execute("SET threads=1")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = make_duck(sf_dir)
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


def assert_df_equal(spark_df, duck_rel, *, check_order: bool = False):
    """Order-insensitive (by default) comparison of a Spark DataFrame against
    a DuckDB relation: same column names, same row multiset."""
    sp_cols = list(spark_df.columns)
    dk_cols = [d[0] for d in duck_rel.description]
    assert sorted(sp_cols) == sorted(dk_cols), f"columns differ: {sp_cols} vs {dk_cols}"
    sp_rows = [tuple(_norm_cell(row[c]) for c in sorted(sp_cols)) for row in spark_df.collect()]
    idx = {c: i for i, c in enumerate(dk_cols)}
    dk_rows = [tuple(_norm_cell(r[idx[c]]) for c in sorted(dk_cols)) for r in duck_rel.fetchall()]
    if not check_order:
        sp_rows = sorted(sp_rows, key=lambda t: tuple(str(x) for x in t))
        dk_rows = sorted(dk_rows, key=lambda t: tuple(str(x) for x in t))
    assert len(sp_rows) == len(dk_rows), f"row counts differ: {len(sp_rows)} vs {len(dk_rows)}"
    for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
        assert a == b, f"row {i} differs:\n  spark: {a}\n  duckdb: {b}"
