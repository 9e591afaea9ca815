"""Deterministic probability-proportional-to-size (PPS) sampling.

Systematic sampling by cumulative integer weights — the data-mixing
primitive behind "sample a k-document training slice where long
documents are proportionally more likely": lay every document's integer
weight end to end on a number line in a canonical order, then pick one
document at every ``step = W div k`` weight units. Deterministic (no
RNG), exactly reproducible across runs and engines (pure integer
arithmetic), and heavy documents can legitimately be picked more than
once (``n_picks`` > 1 — the PPS contract).

The inclusive prefix sum is computed with the scale-correct TWO-PHASE
pattern (a global ``Window.orderBy`` would be one task): range-partition
on the canonical key, per-partition running sums, then one tiny
carry-in frame (per-partition totals, cumulated, broadcast) patches the
offsets — the same machinery as the global as-of carry in
operators/joins.py. Two parallel shuffles total, no single-task stage.

Floor-division discipline: pick counts are
``floor((C-1)/step) - floor((C-w-1)/step)`` over the covered interval
[C-w, C); both numerators are offset by ``+step`` so every operand is
non-negative and Spark's truncating ``div`` equals DuckDB's floor ``//``
— no negative-division semantics gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def systematic_weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    *,
    k: int,
) -> DataFrame:
    """PPS-systematic sample of ~``k`` picks. Returns the selected rows:
    (id, w, c_incl, n_picks) with ``n_picks ≥ 1``; Σ n_picks =
    ceil(W / step). Weights must be non-negative integers; zero-weight
    rows are never picked."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(weight_col).cast("long").alias("w")
    )
    total = base.agg(F.sum("w").alias("W")).collect()[0]["W"]
    step = max(1, int(total) // k)

    part = base.repartitionByRange(F.col("id").asc()).withColumn(
        "__pid", F.spark_partition_id()
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("__cloc", F.sum("w").over(wloc))
    totals = part.groupBy("__pid").agg(F.sum("w").alias("__pt"))
    wcum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "__pid",
        F.coalesce(F.sum("__pt").over(wcum), F.lit(0)).alias("__off"),
    )
    c = (
        local.join(F.broadcast(offs), "__pid")
        .withColumn("c_incl", F.col("__cloc") + F.col("__off"))
        .drop("__pid", "__cloc", "__off")
    )
    picks = F.expr(f"(c_incl - 1 + {step}) div {step}") - F.expr(
        f"(c_incl - w - 1 + {step}) div {step}"
    )
    return (
        c.withColumn("n_picks", picks)
        .filter(F.col("n_picks") >= 1)
        .select("id", "w", "c_incl", "n_picks")
    )
