"""Approximate-sketch accuracy: the sketches whose outputs can't be
hash-compared to DuckDB (different implementations) still get quantified
error bounds against the exact answers on the same session."""

from __future__ import annotations

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table

from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx"),
        F.count_distinct("o_custkey").alias("exact"),
    ).collect()[0]
    # HLL++ with rsd=1%: allow 5 sigma
    assert abs(row["approx"] - row["exact"]) <= max(5, 0.05 * row["exact"])


def test_approx_percentile_within_accuracy(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", 0.5).alias("exact"),
    ).collect()[0]
    # accuracy=10000 → rank error ≤ n/10000; translate to loose value bound
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_freq_items_contains_true_heavy_hitter(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    freq = ev.freqItems(["event_type"], support=0.15).collect()[0][0]
    top = (
        ev.groupBy("event_type").count().orderBy(F.col("count").desc()).first()["event_type"]
    )
    assert top in freq
