"""Shared operator utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Parquet scan split size mirror of spark.sql.files.maxPartitionBytes.
_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _estimated_splits(df: DataFrame) -> int | None:
    """Estimate how many scan splits the source will produce, cheaply.

    ``df.inputFiles()`` walks the analyzed plan only; for local ``file:``
    inputs the split count is ceil(size / maxPartitionBytes) per file
    (Spark splits parquet by byte range). Returns None when the lineage
    is not a plain file scan (shuffles/joins upstream already set
    parallelism) or files are remote.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    splits = 0
    for f in files:
        if f.startswith("file:"):
            path = f[len("file:") :]
            try:
                size = os.path.getsize(path)
            except OSError:
                return None
            splits += max(1, -(-size // _MAX_PARTITION_BYTES))
        else:
            # Remote object store: assume ≥1 split per file; with many
            # files we are already parallel enough to skip the shuffle.
            splits += 1
    return splits


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up if the input scan has fewer splits than cores.

    Small fixture tables arrive as single-file parquet → 1 input split →
    compute-heavy narrow maps (minhash signatures, simhash votes,
    hyperplane dots) run on ONE task. At 100 TB inputs already have
    thousands of splits and this is a no-op; locally it unlocks the other
    31 cores for a ~kB shuffle.

    The split count is estimated from the input file listing (a pure
    analysis-phase call) instead of ``df.rdd.getNumPartitions()`` — the
    RDD conversion forces full physical planning and costs ~0.25 s of
    driver time per call, which dominates short interactive queries.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    splits = _estimated_splits(df)
    if splits is not None and splits < target:
        return df.repartition(target)
    return df
