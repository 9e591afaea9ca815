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

# Headline set: the flagship star join + representative scan/agg/join/topk
# queries. Extended operators are appended as they land (dedup, similarity,
# text) — keep this list in sync with the heaviest things the engine claims.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_revenue_by_nation",
    "q06_forecast_revenue",
    "q10_returned_items_topk",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk_lsh",
    "text_quality_by_source",
    "stream_session_windows",
]


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

    names = [n for n in HEADLINE if n in QUERIES]
    extra = [n for n in sorted(QUERIES) if n not in names and os.environ.get("LDS_BENCH_ALL")]
    timings: dict[str, float] = {}
    for name in names + extra:
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
