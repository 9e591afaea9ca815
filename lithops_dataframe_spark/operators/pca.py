"""Distributed PCA by power iteration — the embedding-whitening /
dimensionality-analysis preprocessing step of a similarity-search
pipeline, in the k-means/BPE/LR iterative shape.

Each iteration multiplies the (implicit, never materialized) covariance
matrix into the current direction: one scan computes per-row centered
dots ``d_i = (x_i - μ)·v`` and accumulates ``w = Σ (x_i - μ)·d_i`` as a
(dim)-keyed aggregate — map-side combinable, dim×1 driver state, no
dim×dim matrix anywhere. At 100 TB an iteration is exactly one scan.

Cross-engine replay discipline (the k-means rules, applied to linear
algebra): the mean and every per-dim accumulation round to 6 decimals
IN-ENGINE (Spark F.round ≡ DuckDB ROUND — never Python's banker's
round); per-row dot products fold left-to-right with the first element
as seed (matching DuckDB's ``list_reduce`` seeding); λ and the
normalized direction derive from the ROUNDED accumulators through
fixed-order expressions, so both engines see identical doubles at every
step and the whole trajectory value-hashes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr):
    """Left fold seeded from the first element — DuckDB list_reduce
    semantics (lesson: its lambda has no init parameter)."""
    return F.aggregate(
        F.slice(arr, 2, F.size(arr) - 1),
        F.element_at(arr, 1),
        lambda acc, y: acc + y,
    )


def pca_power_iteration(
    embs: DataFrame,
    emb_col: str = "embedding",
    *,
    iterations: int = 5,
    dim: int = 64,
) -> DataFrame:
    """Top principal direction of the embedding cloud; returns one row per
    iteration: (iter, lam, var_explained, v_micro string).

    ``v_micro`` is the direction vector serialized as comma-joined
    micro-units (each component × 1e6 as an exact integer — components
    are already rounded to 6 decimals in-engine, so the integers are
    exact in both engines). Scalar-only output columns: result frames
    must canonicalize through pandas sort/hash, which rejects top-level
    array/map cells."""
    spark = embs.sparkSession
    x = embs.select(F.col(emb_col).cast("array<double>").alias("x")).localCheckpoint(
        eager=True
    )
    mu_rows = (
        x.select(F.posexplode("x").alias("j", "val"))
        .groupBy("j")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .collect()
    )
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["j"]] = float(r["m"])
    mu_lit = F.array(*[F.lit(m) for m in mu])

    # total centered sum of squares (variance-explained denominator)
    c_expr = F.zip_with(F.col("x"), mu_lit, lambda a, m: a - m)
    totss = float(
        x.select(
            F.round(
                F.sum(_fold_sum(F.transform(c_expr, lambda a: a * a))), 4
            ).alias("t")
        ).collect()[0]["t"]
    )

    v = [round(1.0 / math.sqrt(dim), 6)] * dim  # exact literal both engines
    out_rows = []
    for it in range(iterations):
        v_lit = F.array(*[F.lit(c) for c in v])
        centered = x.select(
            c_expr.alias("c"),
        ).select(
            "c",
            _fold_sum(F.zip_with(F.col("c"), v_lit, lambda a, b: a * b)).alias("d"),
        )
        # ONE scan + ONE cluster job per iteration (r6 — was two scans and
        # two collects): the per-dim accumulation and Σd² share the same
        # exploded aggregation. Every j-group sees each row's d exactly
        # once, so any group's sum(d·d) is the global Σd² — read it from
        # the j=0 row. Same values, same 4/6-decimal rounding as before.
        perj = (
            centered.select(F.posexplode("c").alias("j", "cj"), "d")
            .groupBy("j")
            .agg(
                F.round(F.sum(F.col("cj") * F.col("d")), 6).alias("w"),
                F.round(F.sum(F.col("d") * F.col("d")), 4).alias("dd"),
            )
        )
        # λ + normalization + variance-explained from the ROUNDED per-dim
        # w, computed IN-ENGINE (Spark round ≡ DuckDB ROUND — Python's is
        # banker's) in the SAME job as the accumulation: a second global
        # aggregate over the 64 per-j rows replaces the r11 shape's
        # separate driver-sized range(1) collect — one action per
        # iteration instead of two (r12, guide §1.2). w folds in j order
        # (array_sort on the (j, w) structs), identical to the previous
        # w_lit literal order, so every double matches bit-for-bit.
        w_arr = F.transform(
            F.array_sort(F.collect_list(F.struct("j", "w"))), lambda s: s["w"]
        )
        lam_e = F.round(F.sqrt(_fold_sum(F.transform(w_arr, lambda a: a * a))), 6)
        d2_e = F.max(F.when(F.col("j") == 0, F.col("dd")))
        row = (
            perj.agg(w_arr.alias("__w"), lam_e.alias("lam"), d2_e.alias("__d2"))
            .select(
                "lam",
                F.transform(F.col("__w"), lambda a: F.round(a / F.col("lam"), 6)).alias("v"),
                F.round(F.col("__d2") / F.lit(totss), 6).alias("ve"),
            )
            .collect()[0]
        )
        lam = float(row["lam"])
        v = [float(c) for c in row["v"]]
        v_micro = ",".join(str(int(round(c * 1e6))) for c in v)
        out_rows.append((it, lam, float(row["ve"]), v_micro))

    from lithops_dataframe_spark.operators.util import values_frame

    return values_frame(
        spark, out_rows, "iter int, lam double, var_explained double, v_micro string"
    )
