"""K-means (Lloyd's algorithm) in pure DataFrame operations — the trained
coarse quantizer for IVF similarity search (operators/similarity.py uses a
fixed quantizer; this trains one).

Iteration structure (the canonical Spark iterative-algorithm shape):
- centroids live on the DRIVER between iterations (k × dim doubles — tiny
  by definition) and ride into the assignment pass as a ONE-ROW broadcast
  frame, not a k×dim literal tree: literals cost ~1s of driver-side
  Catalyst analysis PER iteration at k=8/dim=64 (same lesson as the LSH
  hyperplanes — see SCALE.md), while the broadcast frame is a single
  constant-size build side;
- assignment is a narrow map (distance to each centroid via ONE
  `transform` over the array-of-centroids column; argmin =
  array_position of array_min, which also encodes the lowest-cell-id tie
  break);
- the update step is a hash aggregate per (cell, dimension) with map-side
  combine — one shuffle per iteration carrying k × dim rows.

Determinism contract (for the DuckDB oracle): init = the k lowest-id
vectors; centroids are ROUNDED to 6 decimals after every update, so both
engines compute distances from bit-identical centroid values; argmin
ties break on cell id. Fixed iteration count (no convergence test) keeps
the plan replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lithops_dataframe_spark.operators.util import ensure_parallelism


def assign_cells(df: DataFrame, centroids: list[list[float]], *, emb_col: str = "embedding") -> DataFrame:
    """Attach `cell` = argmin distance (ties → lowest cell id) and `dist2`.

    The centroid matrix is a one-row broadcast frame; distances fold in a
    single `transform` lambda; `array_position(d, array_min(d))` returns
    the FIRST minimal index — exactly the lowest-cell-id tie break.
    """
    from lithops_dataframe_spark.operators.util import matrix_sql, one_row_frame

    spark = df.sparkSession
    # one-row literal frame: zero tasks per broadcast build (r13; the
    # createDataFrame form cost ~0.27 s of pickled-task scheduling per
    # materialization — per k-means ITERATION on this path)
    cents = F.broadcast(one_row_frame(spark, __cents=matrix_sql(centroids)))
    scored = df.crossJoin(cents).withColumn(
        "__d",
        F.transform(
            F.col("__cents"),
            lambda c: F.aggregate(
                F.zip_with(
                    F.col(emb_col), c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )
    return scored.select(
        *df.columns,
        (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1).cast("int").alias("cell"),
        F.round(F.array_min(F.col("__d")), 6).alias("dist2"),
    )


def kmeans_fit(
    df: DataFrame,
    *,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """Fixed-iteration Lloyd's k-means; returns (centroids, assignments).

    assignments = (id, cell, dist2). Each iteration collects k×dim rounded
    means to the driver (legitimately driver-sized state) and re-embeds
    them through the broadcast frame — at 100 TB each iteration is one
    scan + one (cell, dim)-keyed aggregate.
    """
    src = ensure_parallelism(df.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))).persist()
    init = src.filter(F.col("id") < k).orderBy("id").collect()
    centroids = [[round(float(v), 6) for v in r["emb"]] for r in init]

    for _ in range(iterations):
        assigned = assign_cells(src, centroids, emb_col="emb")
        dims = (
            assigned.select("cell", F.posexplode("emb").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # cells that lost all members keep position
        per_cell: dict[int, dict[int, float]] = {}
        for r in dims:
            per_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for cell, mdims in per_cell.items():
            new_c[cell] = [mdims[p] for p in sorted(mdims)]
        centroids = new_c

    out = assign_cells(src, centroids, emb_col="emb").select("id", "cell", "dist2")
    src.unpersist()
    return centroids, out
