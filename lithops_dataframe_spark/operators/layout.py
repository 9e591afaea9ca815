"""Data-layout clustering for scan pruning (SURVEY §2.1 scale path):
Z-order (Morton) interleaving + clustered writes.

Why: at 100 TB the cheapest predicate is the one that never reads the
data. Parquet keeps min/max stats per row group and Spark pushes
predicates into the scan, so rows physically clustered on the filter
columns let entire row groups / files be skipped. Sorting on a single
column only helps that column; bit-interleaving two key columns (Z-order)
gives BOTH dimensions locality, which is how lakehouse engines
(Delta OPTIMIZE ZORDER BY, Iceberg sort orders) cluster multi-dimensional
scans. Here the whole mechanism is built from DataFrame ops:

- :func:`zorder_value`: JVM-side Morton interleave expression (no UDF) —
  bit i of each key lands at bits 2i / 2i+1 of the z-value. A SQL twin
  makes it oracle-checkable.
- :func:`write_zordered`: range-partition by z → sort within partitions
  by z → write. Range partitioning makes files own disjoint z-ranges
  (global clustering), the within-file sort tightens row-group stats.

tests/test_layout.py measures the actual effect: the scan's post-pushdown
output rows on a 2-D predicate drop by an order of magnitude vs the same
data written in hash-shuffled order.

Reference context: the reference has no layout control at all (one CSV,
byte-range chunks — io.py:13-88); this is the piece that makes its
"filter the table" workloads affordable at lake scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_value_sql", "write_zordered"]


def zorder_value(a: str, b: str, *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int column
    expressions (given as SQL strings) into a single long: result bit 2i =
    bit i of a, bit 2i+1 = bit i of b. Pure JVM expression (aggregate over
    a literal sequence → codegen, no UDF)."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + shiftleft(CAST(shiftright(({a}), i) & 1 AS BIGINT), 2 * i) "
        f"    + shiftleft(CAST(shiftright(({b}), i) & 1 AS BIGINT), 2 * i + 1))"
    )


def zorder_value_sql(a: str, b: str, *, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_value`."""
    return (
        f"list_sum(list_transform(range({bits}), i -> "
        f"((({a}) >> i) & 1) * (1::BIGINT << (2 * i)) + "
        f"((({b}) >> i) & 1) * (1::BIGINT << (2 * i + 1))))"
    )


def write_zordered(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    *,
    bits: int = 16,
    n_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Cluster ``df`` on (col_a, col_b) via Z-order and write parquet:
    rows range-partition on z (files own disjoint z-ranges) and sort by z
    within each partition (tight row-group min/max on both key columns)."""
    z = zorder_value(col_a, col_b, bits=bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
