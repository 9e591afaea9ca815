"""Time-series downsampling: parallel LTTB (largest-triangle-three-buckets).

The hypertable visualization operator (Steinarsson 2013; TimescaleCompat
`lttb()`): reduce each entity's series to K points that preserve visual
shape, keeping the points that span the largest triangles with their
neighbors. Classic LTTB is sequential (each bucket's pick anchors the
next); this implements the standard PARALLEL variant that anchors every
bucket on its NEIGHBOR BUCKETS' MEAN points instead of the previous pick
— each bucket decides independently, so the whole operator is window
functions + one aggregate per (entity, bucket), embarrassingly parallel
across entities at any scale.

EXACT integer argmax (the PageRank fixed-point discipline applied to
geometry): with x in shifted epoch seconds (BIGINT) and y in cents
(BIGINT), the triangle-area comparison multiplies through by the anchor
denominators —

    2·Area · na²·nc = (Sxa·nc − Sxc·na)(yb·na − Sya)
                    − (Sxa − xb·na)(Sya·nc − Syc·na)

(Sx/Sy/n are the anchor buckets' integer sums/counts; na, nc are constant
within a bucket, so argmax|S| ≡ argmax Area). Every term is an int64 —
no float enters the selection, so Spark and any replaying engine pick
bit-identical points with the (|S| desc, ts asc, id asc) tie-break.
Overflow bound: |S| ≲ n³·x_span·y_max must stay under 2^63 — holds to
~10⁴ points per entity at second resolution and 10⁶ cents; rescale x to
coarser units for longer series (ANSI mode makes a violation a loud
error, never a wrong answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lttb_downsample(
    df: DataFrame,
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 10,
) -> DataFrame:
    """Downsample each entity's (ts, value) series to ≤ ``k`` points.

    Returns (entity, bucket, ts, cents): bucket −1 is the always-kept
    first point, ``k−2`` the always-kept last point, 0..k−3 the interior
    LTTB picks (at most one per bucket; buckets can be empty when the
    series is short). Series with ≤ 2 points keep only their endpoints.
    """
    nb = k - 2  # interior buckets
    e = df.select(
        F.col(entity_col).alias("ent"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("id"),
        F.round(F.col(value_col) * 100, 0).cast("long").alias("y"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("xus"),
    )
    went = Window.partitionBy("ent")
    worder = went.orderBy("ts", "id")
    pts = e.select(
        "ent",
        "ts",
        "y",
        (
            F.expr("xus div 1000000") - F.min(F.expr("xus div 1000000")).over(went)
        ).alias("x"),
        F.row_number().over(worder).alias("rk"),
        F.count(F.lit(1)).over(went).alias("n"),
        "id",
    )
    first = pts.filter(F.col("rk") == 1).select(
        "ent", F.lit(-1).alias("bucket"), "ts", F.col("y").alias("cents"),
        F.col("x").alias("ax"), F.col("y").alias("ay"),
    )
    last = pts.filter((F.col("rk") == F.col("n")) & (F.col("n") > 1)).select(
        "ent", F.lit(nb).alias("bucket"), "ts", F.col("y").alias("cents"),
        F.col("x").alias("ax"), F.col("y").alias("ay"),
    )
    interior = pts.filter((F.col("rk") > 1) & (F.col("rk") < F.col("n"))).withColumn(
        "j", F.expr(f"((rk - 2) * {nb}) div (n - 2)")
    )
    sums = interior.groupBy("ent", "j").agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy"), F.count(F.lit(1)).alias("cnt")
    )
    wj = Window.partitionBy("ent").orderBy("j")
    # neighbor-bucket anchors; first/last points fill the open ends
    # (cnt 1, sums = the endpoint coordinates)
    anch = (
        sums.join(first.select("ent", "ax", "ay"), "ent")
        .join(
            last.select("ent", F.col("ax").alias("zx"), F.col("ay").alias("zy")),
            "ent",
            "left",  # n==2 has no interior rows anyway; left keeps planner happy
        )
        .select(
            "ent",
            "j",
            F.coalesce(F.lag("sx").over(wj), F.col("ax")).alias("sxa"),
            F.coalesce(F.lag("sy").over(wj), F.col("ay")).alias("sya"),
            F.coalesce(F.lag("cnt").over(wj), F.lit(1)).alias("na"),
            F.coalesce(F.lead("sx").over(wj), F.col("zx")).alias("sxc"),
            F.coalesce(F.lead("sy").over(wj), F.col("zy")).alias("syc"),
            F.coalesce(F.lead("cnt").over(wj), F.lit(1)).alias("nc"),
        )
    )
    cand = interior.join(anch, ["ent", "j"]).withColumn(
        "s2",
        F.abs(
            (F.col("sxa") * F.col("nc") - F.col("sxc") * F.col("na"))
            * (F.col("y") * F.col("na") - F.col("sya"))
            - (F.col("sxa") - F.col("x") * F.col("na"))
            * (F.col("sya") * F.col("nc") - F.col("syc") * F.col("na"))
        ),
    )
    wpick = Window.partitionBy("ent", "j").orderBy(
        F.col("s2").desc(), F.col("ts").asc(), F.col("id").asc()
    )
    picks = (
        cand.withColumn("pr", F.row_number().over(wpick))
        .filter(F.col("pr") == 1)
        .select("ent", F.col("j").alias("bucket"), "ts", F.col("y").alias("cents"))
    )
    return (
        first.select("ent", "bucket", "ts", "cents")
        .unionByName(picks)
        .unionByName(last.select("ent", "bucket", "ts", "cents"))
        .withColumnRenamed("ent", entity_col)
    )
