"""Recommender-system building blocks over the TPC-H basket structure:
item-item co-occurrence mining — the first stage of every collaborative
filter / market-basket / "frequently bought together" pipeline.

Scale notes in the query docstring; full value-hash oracle (all-integer
lift, no float tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register

_COOC_TOPK = 20

_COOC_ORACLE = f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    freq AS (SELECT pk, COUNT(*)::BIGINT AS c FROM items GROUP BY pk),
    n AS (SELECT COUNT(DISTINCT ok)::BIGINT AS n FROM items),
    pairs AS (
        SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*)::BIGINT AS both_cnt
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, both_cnt, fa.c AS cnt_a, fb.c AS cnt_b,
           ((both_cnt * n.n * 1000) // (fa.c * fb.c))::BIGINT AS lift_permille
    FROM pairs JOIN freq fa ON fa.pk = pairs.part_a
               JOIN freq fb ON fb.pk = pairs.part_b
               CROSS JOIN n
    ORDER BY lift_permille DESC, part_a, part_b LIMIT {_COOC_TOPK}
"""


@register("cf_part_cooccurrence_lift", oracle=_COOC_ORACLE)
def cf_part_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with exact integer lift — the
    "frequently bought together" candidate miner: parts sharing an order
    form a pair, pairs seen in ≥2 baskets are ranked by lift
    ``P(a,b) / (P(a)·P(b))`` as an all-BIGINT permille
    (``both·N·1000 div (cnt_a·cnt_b)``), ties broken by part keys so the
    top-K cut is bit-deterministic.

    Scale shape: the pair generator is a self-equi-join on the basket key
    — per-basket work is C(k,2) with k bounded by basket size (≤7 in
    TPC-H; real carts are similarly small), so output is linear in
    baskets, not quadratic in catalog. One shuffle on order key for the
    join, one hash aggregate on the pair key; item frequencies join back
    on the part key and the total-basket count rides as a one-row
    broadcast. Skewed mega-baskets would be capped/salted upstream —
    C(k,2) is the known quadratic hazard of basket mining."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    freq = items.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = items.agg(F.count_distinct("ok").cast("long").alias("n"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("both_cnt"))
        .where(F.col("both_cnt") >= 2)
    )
    fa = freq.select(F.col("pk").alias("part_a"), F.col("c").alias("cnt_a"))
    fb = freq.select(F.col("pk").alias("part_b"), F.col("c").alias("cnt_b"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "both_cnt",
            "cnt_a",
            "cnt_b",
            F.expr("(both_cnt * n * 1000) div (cnt_a * cnt_b)")
            .cast("long")
            .alias("lift_permille"),
        )
        .orderBy(F.col("lift_permille").desc(), "part_a", "part_b")
        .limit(_COOC_TOPK)
    )
