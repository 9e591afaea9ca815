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


def weighted_interleave_epoch(
    df: DataFrame,
    source_col: str,
    id_col: str,
    *,
    budget: int,
) -> DataFrame:
    """Deterministic source-weighted dataset mixing — the APPLY half of
    temperature sampling (sample_temperature_weights computes the plan;
    this materializes one training epoch in its interleaved serve order).

    Per source s: weight w_s = ⌊√n_s⌋ (integer-exact temperature-0.5 —
    IEEE sqrt is correctly rounded, so the floor replays bit-identically
    in any engine), quota k_s = min(n_s, budget·w_s div Σw). Rows are
    picked per source by md5 hash order (deterministic shuffle), and the
    epoch position follows WEIGHTED ROUND-ROBIN: row r of source s serves
    at virtual time v = r/k_s, ordered by (v, source).

    The scale trick: that global order is computed in CLOSED FORM, not
    with a global window. Under (v ASC, source ASC),

        pos(s, r) = r + Σ_{s'≠s} [ ⌈r·k_s'/k_s⌉ − 1
                                   + 1 if r·k_s' ≡ 0 (mod k_s) ∧ s' < s ]

    — each term counts how many of source s' rows serve strictly before
    (or tie-break before) this one. The per-source quota table is
    driver-sized model state (like LR weights or k-means centroids):
    collected once, re-broadcast as an array literal, and folded with one
    ``aggregate`` HOF — so the whole epoch assignment is ONE shuffle (the
    per-source rank window), no global sort, no single-task stage.
    Integer ceils use (q − q mod k)/k + [q mod k > 0]; exact while
    r·k' < 2⁵³ (quotas beyond ~9·10⁷ rows per source should switch the
    division to the SQL `div` operator).
    """
    base = df.select(F.col(source_col).alias("source"), F.col(id_col).alias("id"))
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    wts = counts.withColumn("w", F.floor(F.sqrt(F.col("n"))).cast("long"))
    total_w = wts.agg(F.sum("w").alias("tw")).collect()[0]["tw"]
    quotas = wts.select(
        "source",
        F.least(
            F.col("n"),
            ((F.lit(int(budget)) * F.col("w")) - (F.lit(int(budget)) * F.col("w")) % F.lit(int(total_w)))
            / F.lit(int(total_w)),
        )
        .cast("long")
        .alias("k"),
    ).filter(F.col("k") >= 1)

    ranked = base.join(F.broadcast(quotas), "source").withColumn(
        "r",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("id").cast("string")).asc(), F.col("id").asc()
            )
        )
        .cast("long"),
    )
    sel = ranked.filter(F.col("r") <= F.col("k"))

    # quota table → driver (S rows of model state) → array literal
    ktab = sorted((row["source"], int(row["k"])) for row in quotas.collect())
    arr = F.array(
        *[
            F.struct(F.lit(s).alias("src"), F.lit(k).cast("long").alias("kk"))
            for s, k in ktab
        ]
    )

    def term(acc, x):
        q = F.col("r") * x["kk"]
        m = q % F.col("k")
        ceil_div = ((q - m) / F.col("k")).cast("long") + F.when(m > 0, F.lit(1)).otherwise(F.lit(0))
        tie = F.when((m == 0) & (x["src"] < F.col("source")), F.lit(1)).otherwise(F.lit(0))
        return acc + F.when(
            x["src"] == F.col("source"), F.lit(0).cast("long")
        ).otherwise(ceil_div - 1 + tie)

    return sel.select(
        "id",
        "source",
        "r",
        (F.col("r") + F.aggregate(arr, F.lit(0).cast("long"), term)).alias("epoch_pos"),
    )
