"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up if the input has fewer partitions than cores.

    Small fixture tables arrive as single-file parquet → 1 input split →
    compute-heavy narrow maps (minhash signatures, simhash votes,
    hyperplane dots) run on ONE task. At 100 TB inputs already have
    thousands of splits and this is a no-op; locally it unlocks the other
    31 cores for a ~kB shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
