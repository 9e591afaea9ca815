"""Randomized query-equivalence fuzzing: hypothesis generates small
relational specs (range filters × group keys × aggregates over lineitem),
each executed BOTH as a Spark DataFrame plan and as DuckDB SQL built from
the same spec. Catches semantic drift (null handling, type coercion,
filter-boundary off-by-ones) across the whole filter/project/groupBy/agg
surface, not just the hand-picked registry queries.

Kept to integer-exact aggregates (COUNT / SUM(BIGINT-cast) / MIN / MAX)
so equivalence is exact, never tolerance-based.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table

from tests.conftest import SF_SMOKE, assert_df_equal

_GROUP_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]

_spec = st.fixed_dictionaries(
    {
        "qty_lo": st.integers(1, 45),
        "qty_span": st.integers(0, 30),
        "flag_filter": st.sampled_from([None, "A", "N", "R"]),
        "keys": st.sets(st.sampled_from(_GROUP_KEYS), min_size=0, max_size=2),
        "aggs": st.sets(
            st.sampled_from(["n", "sum_ok", "min_ln", "max_qty"]), min_size=1, max_size=4
        ),
    }
)


@settings(max_examples=25, deadline=None)
@given(spec=_spec)
def test_random_filter_group_agg_equivalence(spark, duck, spec):
    qty_hi = spec["qty_lo"] + spec["qty_span"]
    keys = sorted(spec["keys"])
    aggs = sorted(spec["aggs"])

    df = load_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_quantity").between(spec["qty_lo"], qty_hi)
    )
    conds = [f"l_quantity BETWEEN {spec['qty_lo']} AND {qty_hi}"]
    if spec["flag_filter"] is not None:
        df = df.filter(F.col("l_returnflag") == spec["flag_filter"])
        conds.append(f"l_returnflag = '{spec['flag_filter']}'")

    agg_cols = {
        "n": (F.count(F.lit(1)).alias("n"), "COUNT(*) AS n"),
        "sum_ok": (
            F.sum("l_orderkey").cast("long").alias("sum_ok"),
            "CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok",
        ),
        "min_ln": (F.min("l_linenumber").alias("min_ln"), "MIN(l_linenumber) AS min_ln"),
        "max_qty": (
            F.max(F.col("l_quantity").cast("long")).alias("max_qty"),
            "MAX(CAST(l_quantity AS BIGINT)) AS max_qty",
        ),
    }
    spark_aggs = [agg_cols[a][0] for a in aggs]
    sql_aggs = [agg_cols[a][1] for a in aggs]

    if keys:
        result = df.groupBy(*keys).agg(*spark_aggs)
        sql = (
            f"SELECT {', '.join(keys + sql_aggs)} FROM lineitem "
            f"WHERE {' AND '.join(conds)} GROUP BY {', '.join(keys)}"
        )
    else:
        result = df.agg(*spark_aggs)
        sql = f"SELECT {', '.join(sql_aggs)} FROM lineitem WHERE {' AND '.join(conds)}"

    assert_df_equal(result, duck.sql(sql))


_join_spec = st.fixed_dictionaries(
    {
        "join_type": st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
        "bal_lo": st.integers(-999, 9000),
        "status": st.sampled_from([None, "O", "F", "P"]),
    }
)

_SQL_JOIN = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "left_semi": "SEMI JOIN",
    "left_anti": "ANTI JOIN",
}


@settings(max_examples=20, deadline=None)
@given(spec=_join_spec)
def test_random_join_equivalence(spark, duck, spec):
    """Random customer⋈orders joins across four join types with random
    filters on both sides, reduced to integer-exact aggregates."""
    cust = load_table(spark, SF_SMOKE, "customer").filter(
        F.col("c_acctbal") >= spec["bal_lo"]
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    o_cond = "TRUE"
    if spec["status"] is not None:
        orders = orders.filter(F.col("o_orderstatus") == spec["status"])
        o_cond = f"o_orderstatus = '{spec['status']}'"

    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, spec["join_type"])
    if spec["join_type"] in ("left_semi", "left_anti"):
        result = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
        sql = (
            f"SELECT COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
            f"FROM customer {_SQL_JOIN[spec['join_type']]} "
            f"(SELECT * FROM orders WHERE {o_cond}) o ON o.o_custkey = c_custkey "
            f"WHERE c_acctbal >= {spec['bal_lo']}"
        )
    else:
        result = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
            F.count("o_orderkey").alias("n_orders"),
        )
        sql = (
            f"SELECT COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum, "
            f"COUNT(o_orderkey) AS n_orders "
            f"FROM (SELECT * FROM customer WHERE c_acctbal >= {spec['bal_lo']}) c "
            f"{_SQL_JOIN[spec['join_type']]} "
            f"(SELECT * FROM orders WHERE {o_cond}) o ON o.o_custkey = c.c_custkey"
        )
    assert_df_equal(result, duck.sql(sql))
