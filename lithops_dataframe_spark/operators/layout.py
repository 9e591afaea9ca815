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


def _spread16(x: str) -> str:
    """Classic magic-mask bit spread: 16-bit value → its bits at even
    positions of a 32-bit value. Pure integer arithmetic — identical
    result to the per-bit fold, ~10× cheaper (a dozen codegen ops vs a
    16-iteration interpreted lambda; measured on the sf0.1 clustered
    write)."""
    s = f"(CAST(({x}) AS BIGINT) & 65535)"
    s = f"(({s} | shiftleft({s}, 8)) & 16711935)"  # 0x00FF00FF
    s = f"(({s} | shiftleft({s}, 4)) & 252645135)"  # 0x0F0F0F0F
    s = f"(({s} | shiftleft({s}, 2)) & 858993459)"  # 0x33333333
    s = f"(({s} | shiftleft({s}, 1)) & 1431655765)"  # 0x55555555
    return s


def zorder_value(a: str, b: str, *, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` (≤16) of two non-negative int
    column expressions (given as SQL strings) into a single long: result
    bit 2i = bit i of a, bit 2i+1 = bit i of b. Magic-mask spread —
    straight-line integer codegen, no UDF, no higher-order function."""
    if bits > 16:
        raise ValueError("zorder_value supports up to 16 bits per key")
    mask = (1 << bits) - 1
    return F.expr(
        f"({_spread16(f'({a}) & {mask}')} | shiftleft({_spread16(f'({b}) & {mask}')}, 1))"
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
