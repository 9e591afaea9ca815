"""Event-sequence (funnel) analytics over the events table: per-user
ordered progression view → click → purchase, counted per stage.

Plan shape: ONE shuffle on user_id, then per-user conditional mins — the
funnel condition (each stage's first occurrence after the previous
stage's) is pure aggregation logic, no self-joins, no window explosion.
At 100 TB this is a single hash-aggregate pass over the event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register

_FUNNEL_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ),
    s2 AS (
        SELECT p.user_id, p.t_view,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts > p.t_view THEN e.ts END) AS t_click
        FROM per_user p LEFT JOIN events e ON e.user_id = p.user_id
        GROUP BY p.user_id, p.t_view
    ),
    s3 AS (
        SELECT s2.user_id, s2.t_view, s2.t_click,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_click THEN e.ts END) AS t_purchase
        FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
        GROUP BY s2.user_id, s2.t_view, s2.t_click
    )
    SELECT COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_view_click,
           COUNT(t_purchase) AS n_view_click_purchase
    FROM s3
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel via two-phase conditional aggregation: first stage mins per
    user, then each later stage's earliest occurrence strictly after the
    prior stage (min_by-free formulation that both engines express
    identically). Spark runs it as consecutive hash aggregates sharing the
    user_id partitioning."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    p1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        p1.join(ev, "user_id", "left")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        s2.join(ev, "user_id", "left")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    return s3.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )
