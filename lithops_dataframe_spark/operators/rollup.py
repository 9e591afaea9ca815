"""Hypertable-style continuous aggregate: a materialized time-bucket rollup
plus on-the-fly aggregation of the un-materialized tail, merged to answer
as if the full raw table were aggregated (north-star custom operator; the
reference has no time-series machinery at all).

Scale design: the rollup table is day-partitioned parquet — refresh jobs
rewrite only the days touched by late data (partition overwrite), queries
over history read ~1 row per (day, key) instead of the raw events, and
only the tail (after ``cutoff``) scans raw data. This is the batch half of
the incremental-view-maintenance discipline whose streaming half lives in
streaming/events.py (same aggregate shapes, watermark-bounded).

Mergeability contract: only decomposable aggregates (count, sum, min,
max — and avg as sum/count at read time) are materialized, so
rollup ⊕ tail = full recompute exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def daily_rollup(events: DataFrame) -> DataFrame:
    """Mergeable per-(day, event_type) partials of the events table.

    Hypertable contract: a row without event time belongs to no day
    bucket — excluded here (and in the continuous-aggregate oracle)
    rather than left to diverge in the history/tail split, where
    ``day < boundary`` / ``ts >= boundary`` predicates silently drop the
    NULL-day group from one side only (edge-fixture r8)."""
    return events.filter(F.col("ts").isNotNull()).groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def materialize_rollup(events: DataFrame, path: str) -> None:
    """Write the rollup day-partitioned (refresh = overwrite touched days)."""
    daily_rollup(events).withColumn("day_part", F.date_format("day", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("day_part").parquet(path)


def refresh_days(events: DataFrame, path: str, days: list[str]) -> None:
    """Incremental refresh: recompute ONLY the listed days (late-data
    arrival) and overwrite just those partitions — dynamic partition
    overwrite, the O(touched days) maintenance path that makes the rollup
    viable at 100 TB (a full rewrite would scan everything).
    """
    spark = events.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        subset = events.filter(F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").isin(days))
        daily_rollup(subset).withColumn(
            "day_part", F.date_format("day", "yyyy-MM-dd")
        ).write.mode("overwrite").partitionBy("day_part").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def query_with_tail(
    spark: SparkSession, rollup_path: str, raw_events: DataFrame, cutoff
) -> DataFrame:
    """Answer daily (day, event_type) aggregates over ALL data by merging
    the materialized rollup (full days before cutoff) with a raw scan of
    the tail. Returns (day, event_type, n_events, sum_value, min_value,
    max_value, avg_value) identical to a full recompute.

    The split point is ``date_trunc('day', cutoff)``: the rollup stores
    whole-day partials only, so a mid-day cutoff must take history strictly
    BEFORE the cutoff's day and scan raw events from that day boundary —
    comparing the rollup against the raw cutoff would keep day(cutoff)'s
    full partial AND re-aggregate its tail, double-counting the overlap.
    """
    boundary = F.date_trunc("day", F.lit(cutoff))
    hist = (
        spark.read.parquet(rollup_path)
        .filter(F.col("day") < boundary)
        .select("day", "event_type", "n_events", "sum_value", "min_value", "max_value")
    )
    tail = daily_rollup(raw_events.filter(F.col("ts") >= boundary)).select(
        "day", "event_type", "n_events", "sum_value", "min_value", "max_value"
    )
    merged = (
        hist.unionByName(tail)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return merged.select(
        "day",
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )
