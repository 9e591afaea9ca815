"""Cold-process, driver-shaped A/B of the session join config over the
TPC-H family (VERDICT r12 item 7).

One invocation = ONE fresh JVM measuring the 22 TPC-H headline queries at
$SPARK_GRAFT_SF_DIR with bench.py's exact methodology (sf0.001 JIT warmup,
two interleaved timed passes, best-of-2 per query) and printing one JSON
line {leg, cpus, total, queries}. The conf under test is whatever the
session factory reads from the environment (SPARK_GRAFT_PREFER_SMJ /
SPARK_GRAFT_SHJ_THRESHOLD), so legs are selected by env, e.g.:

    # r12 leg: static SHJ + AQE rewrite        (prefer_smj=false, 64MB)
    # safe leg: SMJ static, AQE-only SHJ       (prefer_smj=true,  64MB)
    # r11 leg: no SHJ at all                   (prefer_smj=true,  0)

Run legs as INTERLEAVED processes (A B C A B C ...) so host drift spreads
across all legs; aggregate with min/median per leg across processes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import TPCH  # noqa: E402
from lithops_dataframe_spark.plans import QUERIES  # noqa: E402
from lithops_dataframe_spark.session import get_spark  # noqa: E402


def main() -> None:
    leg = sys.argv[1] if len(sys.argv) > 1 else "unnamed"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lds-tpch-cold-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_sf):
        for name in TPCH:
            QUERIES[name](spark, warm_sf).collect()
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in TPCH:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            t = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, float("inf")), t), 4)
    out = {
        "leg": leg,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "prefer_smj": os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        "shj_threshold": os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "64MB"),
        "total": round(sum(timings.values()), 4),
        "queries": timings,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
