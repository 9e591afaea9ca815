"""``describe`` summary-statistics query: LDFrame.describe over lineitem
numerics vs a DuckDB oracle built from the same statistic definitions
(stddev_samp, quantile_cont interpolation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.frame import LDFrame
from lithops_dataframe_spark.plans.registry import register

_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

_PIECES = {
    "count": "COUNT({c})::DOUBLE",
    "mean": "AVG({c})",
    "std": "STDDEV_SAMP({c})",
    "min": "MIN({c})::DOUBLE",
    "p25": "quantile_cont({c}, 0.25)",
    "p50": "quantile_cont({c}, 0.5)",
    "p75": "quantile_cont({c}, 0.75)",
    "max": "MAX({c})::DOUBLE",
}

_DESCRIBE_ORACLE = "\n    UNION ALL ".join(
    "SELECT '{s}' AS summary, ".format(s=s)
    + ", ".join(f"ROUND({tpl.format(c=c)}, 6) AS {c}" for c in _COLS)
    + " FROM lineitem"
    for s, tpl in _PIECES.items()
)


@register("frame_describe", oracle=_DESCRIBE_ORACLE)
def frame_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(*_COLS)
    d = LDFrame(li).describe()
    return d.select("summary", *[F.round(F.col(c), 6).alias(c) for c in _COLS])


_APPROX_COLS = ["l_quantity", "l_discount", "l_tax"]
_APPROX_ACC = 10000  # approx_percentile accuracy → rank error ≤ n/accuracy
_APPROX_QS = (("p25", 0.25), ("p50", 0.5), ("p75", 0.75))

_DESCRIBE_APPROX_ORACLE = "SELECT " + ", ".join(
    ", ".join(
        [
            f"COUNT({c}) AS {c}_count",
            f"ROUND(AVG({c}), 6) AS {c}_mean",
            f"ROUND(STDDEV_SAMP({c}), 6) AS {c}_std",
            f"MIN({c})::DOUBLE AS {c}_min",
            f"MAX({c})::DOUBLE AS {c}_max",
        ]
        + [f"TRUE AS {c}_{qn}_ok" for qn, _ in _APPROX_QS]
    )
    for c in _APPROX_COLS
) + " FROM lineitem"


@register("frame_describe_approx", oracle=_DESCRIBE_APPROX_ORACLE)
def frame_describe_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB describe: sketch percentiles (approx_percentile, bounded
    memory) instead of exact percentile's full-column buffer.

    Tolerance oracle (VERDICT_r02 task 6): a sketch value cannot be
    compared for equality against DuckDB's exact quantile — the GK
    guarantee is a RANK window (error ≤ n/accuracy), not a value. So the
    gate encodes the predicate in the hash: for each requested quantile q
    the Spark side counts, in one pass, how many values fall strictly
    below / at-or-below the sketch's answer and emits
    ``{col}_{q}_ok = (cnt_lt <= q*n + n/acc) AND (cnt_le >= q*n - n/acc)``
    — the sketch's own contract, computed against the real data. The
    oracle emits literal TRUE for those columns (and exact count / mean /
    std / min / max for the rest of the row), so a sketch outside its
    guaranteed rank window hash-mismatches and turns the driver row red.
    This replaces the r02 rows-only check and its documented sf0.1
    rank-boundary exception: a boundary-straddling answer is INSIDE the
    window and passes; a broken sketch is not and fails."""
    li = load_table(spark, sf_dir, "lineitem").select(*_APPROX_COLS)
    d = LDFrame(li).describe(approx=True, accuracy=_APPROX_ACC)
    pct_names = [qn for qn, _ in _APPROX_QS]
    one = (
        d.filter(F.col("summary").isin(pct_names))
        .agg(
            *[
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("summary"), F.col(c)))
                ).alias(f"__{c}_pct")
                for c in _APPROX_COLS
            ]
        )
    )
    joined = li.crossJoin(F.broadcast(one))
    aggs: list = []
    for c in _APPROX_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"{c}_count"),
            F.round(F.avg(c), 6).alias(f"{c}_mean"),
            F.round(F.stddev_samp(c), 6).alias(f"{c}_std"),
            F.min(c).cast("double").alias(f"{c}_min"),
            F.max(c).cast("double").alias(f"{c}_max"),
        ]
        for qn, _q in _APPROX_QS:
            v = F.element_at(F.col(f"__{c}_pct"), qn)
            aggs += [
                F.sum(F.when(F.col(c) < v, 1).otherwise(0)).alias(f"__{c}_{qn}_lt"),
                F.sum(F.when(F.col(c) <= v, 1).otherwise(0)).alias(f"__{c}_{qn}_le"),
            ]
    wide = joined.agg(*aggs)
    sel: list = []
    for c in _APPROX_COLS:
        n = F.col(f"{c}_count")
        eps = n.cast("double") / F.lit(float(_APPROX_ACC))
        sel += [F.col(f"{c}_{s}") for s in ("count", "mean", "std", "min", "max")]
        for qn, q in _APPROX_QS:
            ok = (
                F.col(f"__{c}_{qn}_lt").cast("double") <= F.lit(q) * n.cast("double") + eps
            ) & (
                F.col(f"__{c}_{qn}_le").cast("double") >= F.lit(q) * n.cast("double") - eps
            )
            sel.append(ok.alias(f"{c}_{qn}_ok"))
    return wide.select(*sel)


_PROFILE_ORACLE = """
    SELECT 'orders' AS tbl, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS null_custkey,
           COUNT(DISTINCT o_custkey) AS nd_custkey,
           COUNT(DISTINCT o_orderstatus) AS nd_status,
           COUNT(DISTINCT o_orderpriority) AS nd_priority
    FROM orders
"""


@register("frame_profile", oracle=_PROFILE_ORACLE)
def frame_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: row/null/distinct counts in ONE aggregation
    (a quality-report primitive for pipeline monitoring). At 100 TB swap
    count_distinct for approx_count_distinct — one pass either way."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.lit("orders").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        F.count_distinct("o_custkey").alias("nd_custkey"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.count_distinct("o_orderpriority").alias("nd_priority"),
    )


_GROUP_DESC_ORACLE = """
    SELECT l_returnflag,
           COUNT(l_quantity) AS l_quantity_count,
           ROUND(AVG(l_quantity), 6) AS l_quantity_mean,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS l_quantity_std,
           MIN(l_quantity)::DOUBLE AS l_quantity_min,
           quantile_disc(l_quantity, 0.5)::DOUBLE AS l_quantity_p50,
           MAX(l_quantity)::DOUBLE AS l_quantity_max,
           COUNT(l_tax) AS l_tax_count,
           ROUND(AVG(l_tax), 6) AS l_tax_mean,
           ROUND(STDDEV_SAMP(l_tax), 6) AS l_tax_std,
           MIN(l_tax)::DOUBLE AS l_tax_min,
           quantile_disc(l_tax, 0.5)::DOUBLE AS l_tax_p50,
           MAX(l_tax)::DOUBLE AS l_tax_max
    FROM lineitem GROUP BY l_returnflag
"""


@register("frame_describe_by_group", oracle=_GROUP_DESC_ORACLE)
def frame_describe_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby().describe()`` parity: per-group summary stats in
    one aggregation pass (sketch median — per-key grid columns, same
    oracle discipline as frame_describe_approx)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity", "l_tax")
    d = LDFrame(li).groupby("l_returnflag").describe(["l_quantity", "l_tax"]).spark
    rounded = [
        F.round(F.col(c), 6).alias(c) if c.endswith(("_mean", "_std")) else F.col(c)
        for c in d.columns
    ]
    return d.select(*rounded)
