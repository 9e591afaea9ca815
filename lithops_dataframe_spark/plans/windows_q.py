"""Window-function queries (SURVEY §2.5 — ABSENT in the reference; part of
the required pandas-parity surface: rank/shift/cumsum/rolling).

Every window partitions by a key, so the plan is one hash shuffle on the
partition key then a per-partition sort — the shape that scales. No
global (unpartitioned) windows in headline paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register


@register(
    "win_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    """,
)
def win_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey,
           RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_cumsum_per_supplier",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (
               PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_qty
    FROM lineitem WHERE l_suppkey <= 20
    """,
)
def win_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("cum_qty"),
    )


@register(
    "win_lag_lead_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, ROUND(SUM(l_extendedprice), 2) AS rev
        FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
    )
    SELECT d, rev,
           ROUND(COALESCE(rev - LAG(rev) OVER (ORDER BY d), 0), 2) AS delta_prev,
           LEAD(rev) OVER (ORDER BY d) AS next_rev
    FROM daily
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The inner agg collapses to ~2500 day rows, so the single-partition
    # window over the tiny aggregate is fine at any input scale.
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    w = Window.orderBy("d")
    return daily.select(
        "d",
        "rev",
        F.round(F.coalesce(F.col("rev") - F.lag("rev").over(w), F.lit(0.0)), 2).alias("delta_prev"),
        F.lead("rev").over(w).alias("next_rev"),
    )


@register(
    "win_rolling_avg_user_value",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_avg_7
    FROM events
    """,
)
def win_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas rolling(7) analog: rowsBetween(-6, 0) per user (SURVEY §2.5).
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("rolling_avg_7"),
    )


@register(
    "win_first_last_range",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_event,
           LAST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
           COUNT(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(wfull).alias("last_event"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
    ).distinct()


@register(
    "win_percent_cume",
    oracle="""
    SELECT s_suppkey,
           s_nationkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile in one window pass — the remaining
    SURVEY §2.5 ranking shapes. One shuffle on the partition key; ties are
    impossible (s_suppkey in the ORDER BY), so the relative-rank doubles
    are rank-arithmetic — identical across engines, rounded only for
    normalizer friendliness."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_ranking_combined",
    oracle="""
    WITH w AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER w2 AS rn,
               rank()       OVER w1 AS rnk,
               dense_rank() OVER w1 AS drnk,
               ntile(4)     OVER w2 AS nt,
               ROUND(lag(o_totalprice)  OVER w2, 2) AS prev_price,
               ROUND(lead(o_totalprice) OVER w2, 2) AS next_price,
               ROUND(SUM(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spent
        FROM orders
        WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
               w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, rn, rnk, drnk, nt, prev_price, next_price, cum_spent
    FROM w WHERE rn <= 3
    """,
)
def win_ranking_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every ranking/analytic §2.5 shape in ONE driver-gate slot:
    row_number, rank + dense_rank (value-ties window), ntile, lag/lead,
    and running sum — two window specs, one shuffle on o_custkey (all
    specs share the partition key, so Catalyst plans a single exchange).
    The per-shape queries remain registered as fine-grained twins; the
    rowsBetween/rangeBetween frame variants keep their own events-table
    slots."""
    o = load_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2cum = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w2).alias("rn"),
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w1).alias("drnk"),
        F.ntile(4).over(w2).alias("nt"),
        F.round(F.lag("o_totalprice").over(w2), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w2), 2).alias("next_price"),
        F.round(F.sum("o_totalprice").over(w2cum), 2).alias("cum_spent"),
    )
    return out.filter(F.col("rn") <= 3)
