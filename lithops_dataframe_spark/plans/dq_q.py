"""Data-quality constraint suite (Deequ/Great-Expectations-shaped) — the
validation pass a production pipeline runs before promoting a batch.

One query emits a constraint-report table: each row is (table, constraint,
metric, passed). All metrics are single-pass aggregates or equi-join
anti-counts, so the whole suite costs one scan per table plus one slim
join for referential integrity — the shape that lets a 100 TB batch be
validated as part of its write job rather than a separate read.

The oracle recomputes every metric in SQL, so both the metric VALUES and
the pass/fail verdicts are hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register

_DQ_ORACLE = """
    WITH o AS (
        SELECT COUNT(*) AS n,
               COUNT(o_custkey) AS nn_cust,
               COUNT(DISTINCT o_orderkey) AS dist_ok,
               SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS pos_price
        FROM orders
    ),
    li AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS qty_in_range,
               SUM(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 1 ELSE 0 END) AS disc_in_range
        FROM lineitem
    ),
    ri AS (
        SELECT COUNT(*) AS orphans
        FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IS NULL
    )
    SELECT 'orders' AS tbl, 'complete(o_custkey)' AS check_name,
           nn_cust::BIGINT AS metric, (nn_cust = n) AS passed FROM o
    UNION ALL
    SELECT 'orders', 'unique(o_orderkey)', dist_ok::BIGINT, dist_ok = n FROM o
    UNION ALL
    SELECT 'orders', 'positive(o_totalprice)', pos_price::BIGINT, pos_price = n FROM o
    UNION ALL
    SELECT 'lineitem', 'range(l_quantity,1,50)', qty_in_range::BIGINT,
           qty_in_range = n FROM li
    UNION ALL
    SELECT 'lineitem', 'range(l_discount,0,1)', disc_in_range::BIGINT,
           disc_in_range = n FROM li
    UNION ALL
    SELECT 'lineitem', 'ref(l_orderkey->orders)', orphans::BIGINT, orphans = 0 FROM ri
"""


@register("dq_constraint_suite", oracle=_DQ_ORACLE)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over the star schema: completeness, uniqueness,
    value-range, and referential-integrity checks — each a single-pass
    aggregate (orders and lineitem are each scanned once; the RI check is
    one left-anti count on the join key)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o_m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.count_distinct("o_orderkey").alias("dist_ok"),
        F.sum((F.col("o_totalprice") > 0).cast("int")).alias("pos_price"),
    )
    li_m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").between(1, 50).cast("int")).alias("qty_in_range"),
        F.sum(F.col("l_discount").between(0, 1).cast("int")).alias("disc_in_range"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )

    def row(src, tbl, name, metric, passed):
        return src.select(
            F.lit(tbl).alias("tbl"),
            F.lit(name).alias("check_name"),
            F.col(metric).cast("long").alias("metric"),
            passed.alias("passed"),
        )

    return (
        row(o_m, "orders", "complete(o_custkey)", "nn_cust", F.col("nn_cust") == F.col("n"))
        .unionAll(row(o_m, "orders", "unique(o_orderkey)", "dist_ok", F.col("dist_ok") == F.col("n")))
        .unionAll(
            row(o_m, "orders", "positive(o_totalprice)", "pos_price", F.col("pos_price") == F.col("n"))
        )
        .unionAll(
            row(
                li_m,
                "lineitem",
                "range(l_quantity,1,50)",
                "qty_in_range",
                F.col("qty_in_range") == F.col("n"),
            )
        )
        .unionAll(
            row(
                li_m,
                "lineitem",
                "range(l_discount,0,1)",
                "disc_in_range",
                F.col("disc_in_range") == F.col("n"),
            )
        )
        .unionAll(row(orphans, "lineitem", "ref(l_orderkey->orders)", "orphans", F.col("orphans") == 0))
    )


_SKEW_TOPK = 10

_SKEW_ORACLE = f"""
    WITH kc AS (
        SELECT o_custkey AS k, COUNT(*)::BIGINT AS c FROM orders GROUP BY o_custkey
    ),
    st AS (
        SELECT COUNT(*)::BIGINT AS n_keys, SUM(c)::BIGINT AS n_rows FROM kc
    ),
    top AS (
        SELECT k, c, ROW_NUMBER() OVER (ORDER BY c DESC, k) AS rn FROM kc
    )
    SELECT t.k AS key, t.c AS cnt,
           (t.c * 1000000 // st.n_rows)::BIGINT AS share_ppm,
           (t.c * st.n_keys * 1000 // st.n_rows)::BIGINT AS skew_permille,
           t.rn::INT AS rank
    FROM top t CROSS JOIN st WHERE t.rn <= {_SKEW_TOPK}
"""


@register("dq_key_skew_report", oracle=_SKEW_ORACLE)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the report you run BEFORE a big join to
    decide whether it needs salting or AQE skew handling: per-key row
    counts on the join key (here orders.o_custkey), the top heavy hitters
    with their exact parts-per-million share, and a skew factor
    (key count ÷ mean count, as integer permille — 1000 = perfectly
    uniform). All-BIGINT; ties in the cut break by key.

    Scale shape: one hash aggregate on the key (map-side combine), a
    two-long-row global stat frame broadcast back, and the heavy-hitter
    cut as orderBy+limit — TakeOrderedAndProject keeps a k-row heap per
    partition and merges on the driver, so there is NO single-task global
    sort over the key table (a row_number window here would be one); the
    rank is then numbered over the k surviving rows only. This is the
    cheap probe that justifies the salting strategy join_salted_skew
    demonstrates."""
    o = load_table(spark, sf_dir, "orders")
    kc = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    st = kc.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
    )
    from pyspark.sql.window import Window as W

    top = (
        kc.orderBy(F.col("c").desc(), F.col("k"))
        .limit(_SKEW_TOPK)
        .withColumn(
            "rn", F.row_number().over(W.orderBy(F.col("c").desc(), F.col("k")))
        )
    )
    return top.crossJoin(F.broadcast(st)).select(
        F.col("k").alias("key"),
        F.col("c").alias("cnt"),
        F.expr("c * 1000000 div n_rows").cast("long").alias("share_ppm"),
        F.expr("c * n_keys * 1000 div n_rows").cast("long").alias("skew_permille"),
        F.col("rn").cast("int").alias("rank"),
    )
