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

_APPROX_PIECES = {
    "count": "COUNT({c})::DOUBLE",
    "mean": "AVG({c})",
    "std": "STDDEV_SAMP({c})",
    "min": "MIN({c})::DOUBLE",
    "p25": "quantile_disc({c}, 0.25)::DOUBLE",
    "p50": "quantile_disc({c}, 0.5)::DOUBLE",
    "p75": "quantile_disc({c}, 0.75)::DOUBLE",
    "max": "MAX({c})::DOUBLE",
}

_DESCRIBE_APPROX_ORACLE = "\n    UNION ALL ".join(
    "SELECT '{s}' AS summary, ".format(s=s)
    + ", ".join(f"ROUND({tpl.format(c=c)}, 6) AS {c}" for c in _APPROX_COLS)
    + " FROM lineitem"
    for s, tpl in _APPROX_PIECES.items()
)


@register("frame_describe_approx", oracle=_DESCRIBE_APPROX_ORACLE)
def frame_describe_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB describe: sketch percentiles (approx_percentile, bounded
    memory) instead of exact percentile's full-column buffer.

    Oracle note: the sketch returns an actual data element with rank error
    ≤ n/accuracy; on these grid-valued columns (10-50 distinct values,
    ≥1000 rows per value at the driver's SF) that error can never cross a
    value boundary, so the result equals DuckDB's quantile_disc exactly —
    the same discipline as agg_percentiles_approx. Continuous columns are
    covered by the exact small-data twin (frame_describe).

    Known boundary case (10x SF): at sf0.1 the l_quantity median's exact
    rank falls precisely ON a value boundary (uniform 1..50 grid, even
    per-value counts), so the sketch may legitimately return either
    adjacent grid value while quantile_disc picks one convention — the
    only residual mismatch in the full sf0.1 oracle sweep, and inherent
    to approximate-percentile semantics rather than a defect."""
    li = load_table(spark, sf_dir, "lineitem").select(*_APPROX_COLS)
    d = LDFrame(li).describe(approx=True)
    return d.select("summary", *[F.round(F.col(c), 6).alias(c) for c in _APPROX_COLS])


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
