"""Parallel-LTTB invariants beyond the oracle gate: structure, short
series, and the shape-preservation property (a spike survives)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from lithops_dataframe_spark.operators.timeseries import lttb_downsample


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_lttb_structure(spark):
    rows = [
        (1, i, f"2024-01-01 00:{i:02d}:00", float(i % 7)) for i in range(40)
    ]
    out = lttb_downsample(_mk(spark, rows), k=10).collect()
    buckets = sorted(r["bucket"] for r in out)
    # endpoints always present; at most one pick per interior bucket
    assert buckets[0] == -1 and buckets[-1] == 8
    assert len(buckets) == len(set(buckets)) == 10  # 40 points fill all 8
    ts = {r["bucket"]: r["ts"] for r in out}
    assert min(ts.values()) == ts[-1] and max(ts.values()) == ts[8]


def test_lttb_short_series(spark):
    rows = [
        (1, 0, "2024-01-01 00:00:00", 1.0),  # single point
        (2, 0, "2024-01-01 00:00:00", 1.0),  # two points
        (2, 1, "2024-01-01 00:01:00", 2.0),
        (3, 0, "2024-01-01 00:00:00", 1.0),  # three points: one interior
        (3, 1, "2024-01-01 00:01:00", 9.0),
        (3, 2, "2024-01-01 00:02:00", 1.0),
    ]
    out = lttb_downsample(_mk(spark, rows), k=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["user_id"], []).append(r["bucket"])
    assert sorted(per[1]) == [-1]
    assert sorted(per[2]) == [-1, 8]
    assert sorted(per[3]) == [-1, 0, 8]


def test_lttb_keeps_the_spike(spark):
    """THE point of LTTB: an outlier spike spans the largest triangle in
    its bucket and must survive downsampling where uniform sampling would
    usually drop it."""
    rows = [
        (1, i, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", 10.0)
        for i in range(200)
    ]
    rows[123] = (1, 123, "2024-01-01 02:03:00", 500.0)  # the spike
    out = lttb_downsample(_mk(spark, rows), k=10).collect()
    assert any(r["cents"] == 50000 for r in out), "spike was dropped"
