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


def seasonal_decompose(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    period: int = 24,
    bucket: str = "hour",
) -> DataFrame:
    """Classical additive seasonal decomposition per entity (the
    statsmodels ``seasonal_decompose``/Holt-Winters initialization step,
    re-expressed as pure window algebra):

    1. bucket the series (default hourly) and sum the value as integer
       cents — y(entity, t) is a BIGINT;
    2. trend = centered moving average over ``period+1`` buckets, taken
       as the exact window SUM (×(period+1)) over a RANGE frame on the
       integer bucket index — missing buckets leave the frame short, and
       any frame with fewer than period+1 points yields NULL trend
       (edges and gaps are excluded, as in the classical method);
    3. detrended×(period+1) = (period+1)·y − trend_sum — still exact
       BIGINT;
    4. seasonal index = mean of the detrended values by phase
       (bucket index mod period), divided out once at the end.

    Every intermediate is integer-exact; the single final division is an
    identical double op in any replaying engine. Scale shape: one hash
    agg to (entity, bucket) granularity, one RANGE window per entity
    (shuffle on the entity key only), one tiny phase-level agg —
    embarrassingly parallel across entities; no global window anywhere.
    """
    seconds = {"hour": 3600, "day": 86400}[bucket]
    m = period + 1  # centered window width (odd)
    half = period // 2
    hourly = (
        df.groupBy(
            F.col(entity_col).alias("ent"),
            (F.unix_seconds(F.date_trunc(bucket, F.col(ts_col)).cast("timestamp")) / seconds)
            .cast("long")
            .alias("t"),
        )
        .agg(F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("cents"))
    )
    w = Window.partitionBy("ent").orderBy("t").rangeBetween(-half, half)
    detr = (
        hourly.withColumn("tsum", F.sum("cents").over(w))
        .withColumn("tcnt", F.count(F.lit(1)).over(w))
        .filter(F.col("tcnt") == m)
        .withColumn("detr_m", F.lit(m) * F.col("cents") - F.col("tsum"))
    )
    return (
        detr.groupBy("ent", (F.col("t") % period).cast("int").alias("phase"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.sum("detr_m") / (F.lit(float(m * 100)) * F.count(F.lit(1))), 4).alias(
                "seasonal"
            ),
        )
        .withColumnRenamed("ent", entity_col)
    )


def mad_anomaly_stats(
    df: DataFrame,
    *,
    entity_col: str,
    value_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Robust per-entity anomaly statistics: median / MAD (median absolute
    deviation) of the value, and the count of points outside
    ``median ± k·MAD`` — the standard robust outlier rule (Hampel
    identifier), which unlike mean/stddev does not let the outliers
    inflate their own threshold.

    Exactness discipline: values become integer cents; the median of
    integers is at worst a half-integer (exactly representable), the
    doubled deviation ``|2c − 2·med|`` is again a BIGINT, and the
    anomaly rule ``|c−med| > k·MAD`` becomes ``dev2 > k·mad2`` where
    ``mad2`` is a half-integer and k is expressible in quarters, so both
    sides are exact doubles — bit-identical decisions in any IEEE
    engine. Scale shape: exact
    medians are two sorts within entity partitions (percentile is a
    partial-merge aggregate in Spark); swap in approx_percentile for a
    one-pass sketch when entities have billions of rows.
    """
    assert (4 * k) == int(4 * k), "k must be expressible in quarter units"
    cents = df.select(
        F.col(entity_col).alias("ent"),
        F.round(F.col(value_col) * 100).cast("long").alias("c"),
    )
    from pyspark import StorageLevel

    from lithops_dataframe_spark import cache

    med = cents.groupBy("ent").agg(F.percentile("c", 0.5).alias("med"))
    dev = (
        cents.join(F.broadcast(med), "ent")
        .withColumn(
            "dev2", F.abs(F.lit(2) * F.col("c") - (F.lit(2.0) * F.col("med")).cast("long"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cache.track(dev)
    # persisted: dev feeds both the MAD aggregate and the anomaly count
    # entity-level stats are one row per entity — broadcast them back for
    # the anomaly count instead of re-shuffling the point set
    st = dev.groupBy("ent").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("med"),
        F.percentile("dev2", 0.5).alias("mad2"),
    )
    stats = (
        dev.select("ent", "dev2")
        .join(F.broadcast(st), "ent")
        .groupBy("ent")
        .agg(
            F.first("n").alias("n"),
            F.first("med").alias("med"),
            F.first("mad2").alias("mad2"),
            F.sum(
                F.when(F.col("dev2") > F.lit(float(k)) * F.col("mad2"), 1).otherwise(0)
            ).alias("n_anom"),
        )
    )
    return stats.select(
        F.col("ent").alias(entity_col),
        "n",
        F.round(F.col("med") / 100, 4).alias("med_value"),
        F.round(F.col("mad2") / 200, 4).alias("mad_value"),
        F.col("n_anom").cast("long").alias("n_anom"),
    )
