"""Differential test: every registered query with an oracle must match DuckDB
on the smoke fixture (the driver's t2 gate runs the same comparison at
sf0.01; running it here at sf0.001 keeps the suite fast)."""

from __future__ import annotations

import pytest

from lithops_dataframe_spark.plans import QUERIES, ORACLES

from tests.conftest import assert_df_equal


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    result = QUERIES[name](spark, sf_dir)
    oracle = duck.sql(ORACLES[name])
    assert_df_equal(result, oracle)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
