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


def estimated_input_bytes(df: DataFrame) -> int | None:
    """Total bytes of the plan's file-scan inputs, from the analysis-phase
    file listing (no job). None when the lineage is not a plain local
    file scan — callers choose their own conservative default then."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        if not f.startswith("file:"):
            return None
        try:
            total += os.path.getsize(f[len("file:") :])
        except OSError:
            return None
    return total


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


def empty_frame(spark, schema) -> DataFrame:
    """A zero-row DataFrame with ``schema``, built as a LIMIT-0 projection
    over ``range(0)`` instead of ``spark.createDataFrame([], schema)``.

    The createDataFrame path parallelizes an empty Python list into a
    defaultParallelism-partition RDD whose every action schedules a full
    wave of empty pickled tasks — measured 6-12 s per materialization at
    local[32] (r12). The range(0) form is a plain relational leaf: zero
    tasks, sub-second, same schema, same NULL typing. Used on the hot
    streaming paths (first-epoch index reads, empty micro-batch staging)
    where the empty frame is materialized once per epoch."""
    from pyspark.sql import functions as F

    sch = schema if not isinstance(schema, str) else None
    if sch is None:
        from pyspark.sql.types import _parse_datatype_string

        sch = _parse_datatype_string(schema)
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in sch.fields]
    )


# --- non-finite double policy (r12 edge class) ---
#
# Real event streams carry NaN/±Inf (sensor glitches, upstream division
# artifacts), and the engines disagree on them three ways: Spark's ANSI
# cents-exact casts CRASH (cast(NaN/Inf AS BIGINT) → ARITHMETIC_OVERFLOW),
# DuckDB's own BIGINT cast crashes too, and where nothing crashes the
# comparison/ordering semantics fork (Spark: NaN > x is TRUE, NaN sorts
# largest and equals itself in group keys; DuckDB: IEEE comparisons, own
# ORDER BY rules). The uniform policy is the one production pipelines
# use: a NON-FINITE MEASUREMENT IS A MISSING MEASUREMENT — mapped to NULL
# at first touch, so every downstream statistic flows through the
# NULL-skip machinery both engines agree on (and which the r6-r11 edge
# rows already pin). `FINITE_VALUE_SQL` is the DuckDB twin oracles
# inline; `isfinite()` is false for NaN and ±Inf on both sides.

FINITE_VALUE_SQL = "CASE WHEN isfinite(value) THEN value END"


def finite_or_null(col):
    """``col`` if finite, NULL for NaN/±Inf — the Spark half of the
    non-finite-is-missing policy (see module comment above). Narrow
    per-row expression, JVM-side, codegen-friendly."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = col if isinstance(col, Column) else F.col(col)
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))), c)


def global_row_number(df: DataFrame, order_cols, out_col: str = "rn") -> DataFrame:
    """Exact global ``row_number`` over ``order_cols`` WITHOUT a
    single-task global window — the two-phase prefix pattern shared with
    :func:`lithops_dataframe_spark.operators.sampling.systematic_weighted_sample`:

    1. ``repartitionByRange`` on the sort key (partition i holds a
       contiguous key range ≤ partition i+1's range),
    2. a per-partition ``row_number`` window keyed on
       ``spark_partition_id`` (parallel across partitions),
    3. one tiny carry frame — per-partition row counts, cumulated and
       broadcast — patches the local ranks into global ones.

    Two parallel shuffles total, no single-task stage. ``order_cols``
    must be a deterministic total order (include a unique tiebreak
    column) or the assignment is only rank-stable, not row-stable.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from lithops_dataframe_spark import cache

    # persist_tracked, not bare reuse: `part` feeds BOTH the local-rank
    # branch and the totals branch. If exchange reuse failed to collapse
    # them, repartitionByRange would execute twice with different
    # RangePartitioner sample draws — and two disagreeing __pid layouts
    # would patch local ranks with the wrong carry (same rationale as
    # ks_two_sample_by_group / roc_auc_by_group in operators/evaluation.py).
    part = cache.persist_tracked(
        df.repartitionByRange(*order_cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    wloc = Window.partitionBy("__pid").orderBy(*order_cols)
    local = part.withColumn("__rloc", F.row_number().over(wloc).cast("long"))
    totals = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__pn"))
    wcum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "__pid",
        F.coalesce(F.sum("__pn").over(wcum), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, F.col("__rloc") + F.col("__off"))
        .drop("__pid", "__rloc", "__off")
    )
