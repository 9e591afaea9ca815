"""Scale-path join machinery: bucketed co-located joins (shuffle-free
sort-merge — the 100 TB layout for repeated fact⋈fact joins) and the
salted-join skew fallback, verified for result equivalence with the plain
join and, for bucketing, for the ABSENCE of a shuffle in the physical plan.
"""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators.joins import salted_join

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", salt=8)
    assert _rows(salted) == _rows(plain)


def test_salted_left_join_preserves_unmatched(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey").limit(100)
    o = (
        load_table(spark, SF_SMOKE, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
        .filter(F.col("l_orderkey") % 2 == 0)
    )
    plain = li.join(o, "l_orderkey", "left")
    salted = salted_join(li, o, "l_orderkey", how="left", salt=4)
    assert _rows(salted) == _rows(plain)


def test_bucketed_join_is_shuffle_free(spark):
    """bucketBy(join key) + sortBy on both sides → SortMergeJoin with NO
    Exchange: the co-located layout that removes the per-query shuffle for
    repeated joins on the same key at scale."""
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"li_b_{suffix}", f"o_b_{suffix}"
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(lt)
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(ot)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            lb, ob = spark.table(lt), spark.table(ot)
            j = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
            # result parity with the plain join
            plain = li.join(o, li.l_orderkey == o.o_orderkey)
            assert j.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
