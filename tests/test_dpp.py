"""Dynamic partition pruning: the io_dpp_prune fact scan must carry a
runtime dynamicpruning subquery (not just a static partition filter), and
the query result must match the oracle (covered by test_oracle_queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lithops_dataframe_spark.plans.io_q import dpp_frames

from tests.conftest import SF_SMOKE


def test_fact_scan_has_dynamic_pruning(spark):
    f, d = dpp_frames(spark, SF_SMOKE)
    joined = f.join(d, "m").groupBy("m").agg(F.sum("cents").alias("s"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
