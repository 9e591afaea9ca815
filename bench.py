"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect of the — small, aggregated —
result; full scan/shuffle work happens on the executors). A warmup action
first absorbs JVM/session startup so per-query numbers measure the engine,
not bootstrap.
"""

from __future__ import annotations

import json
import os
import re
import time

from lithops_dataframe_spark.plans import QUERIES
from lithops_dataframe_spark.session import get_spark

# Headline set: the full 22-shape TPC-H sweep plus the heaviest
# LLM-pipeline operators — regressions on any expensive operator are
# visible round-over-round, not just the original 9-query core.
TPCH = [
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_priority_with_late_lines",
    "q05_revenue_by_nation",
    "q06_forecast_revenue",
    "q07_nation_volume",
    "q08_market_share",
    "q09_product_type_profit",
    "q10_returned_items_topk",
    "q11_important_parts",
    "q12_late_line_priorities",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_brand_quantity_bands",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
]

LLM_PIPELINE = [
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk_lsh",
    "sim_cosine_topk_ivf",
    "text_quality_by_source",
    "text_hashed_tfidf",
    "text_repetition_filter",
    "stream_session_windows",
    "pipeline_clean_corpus",
    "pack_training_sequences",
    "emb_int8_quantize",
]

HEADLINE = TPCH + LLM_PIPELINE


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("lds-bench")

    # Warmup: finish JVM/codegen bootstrap AND the parquet reader init
    # (footer reads, filesystem client) so per-query numbers measure the
    # engine, not first-touch setup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    # JIT warmup: one iteration of every headline query at sf0.001 (~100x
    # smaller inputs, results discarded). First-run JVM compilation of the
    # interpreted higher-order-function eval paths and generated classes
    # costs seconds per distinct plan shape and is session-lifetime state,
    # not engine throughput; a warmup iteration at the smallest SF is the
    # standard way to measure steady state. No sf-level data or results
    # are reused — only code paths are warmed.
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_sf):
        for wname in HEADLINE:
            if wname in QUERIES:
                QUERIES[wname](spark, warm_sf).collect()

    names = [n for n in HEADLINE if n in QUERIES]
    extra = [n for n in sorted(QUERIES) if n not in names and os.environ.get("LDS_BENCH_ALL")]
    # Best-of-2 per query, as two INTERLEAVED full passes: steady-state
    # engine throughput is the metric, and a single timing is exposed to
    # one-off host stalls (observed: rare ~15-20s freezes on shared
    # infrastructure with zero matching GC/JIT activity). Interleaving
    # means a multi-second stall lands on different queries in each pass,
    # so the per-query min suppresses it; back-to-back reps would let one
    # stall poison both.
    reps = 1 if os.environ.get("LDS_BENCH_ALL") else 2
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name in names + extra:
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            took = time.perf_counter() - start
            timings[name] = round(min(timings.get(name, float("inf")), took), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "tpch22_total": round(sum(timings.get(n, 0.0) for n in TPCH), 4),
                "llm_pipeline_total": round(
                    sum(timings.get(n, 0.0) for n in LLM_PIPELINE), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
