"""Scaling leg at 10x SF (VERDICT r12 item 8): at sf0.1 every headline
query is overhead-bound — the 8-vs-32-core ratio sits at ~1 and the bench
cannot see parallel speedup. This tool times the most expensive headline
queries through the noop sink on the 10x key-shifted fixture (the same
one the scale curve builds), at the CURRENT $SPARK_GRAFT_CPUS, printing
one JSON line. Run it once per core count in fresh processes:

    SPARK_GRAFT_CPUS=32 python tools/scaling_leg.py > /tmp/leg32.json
    SPARK_GRAFT_CPUS=8  python tools/scaling_leg.py > /tmp/leg8.json

then merge with --merge leg32.json leg8.json > SCALING_r13.json to get
per-query t8/t32 ratios (a healthy parallel query shows ratio >> 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

QUERY_SET = [
    # expensive, fixture-compatible headline/driver rows (pair-mining ops
    # whose OUTPUT explodes on the copied fixture are excluded, same rule
    # as bench.py's scale curve)
    "q05_revenue_by_nation",
    "q09_product_type_profit",
    "q18_large_volume_customers",
    "text_hashed_tfidf",
    "pipeline_clean_corpus",
    "sim_cosine_topk_lsh",
    "text_quality_by_source",
    "text_repetition_filter",
]


def measure() -> None:
    from bench import SCALE_COPIES
    from lithops_dataframe_spark.plans import QUERIES
    from lithops_dataframe_spark.session import get_spark
    from tools.scale_fixture import build

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.path.basename(sf_dir.rstrip("/"))
    import tempfile

    out_dir = os.path.join(tempfile.gettempdir(), f"lds_scale{SCALE_COPIES}_{tag}")
    spark = get_spark("lds-scaling-leg")
    build(spark, sf_dir, out_dir, copies=SCALE_COPIES)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in QUERY_SET:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"scaling-leg:{name}")
        noop(fn(spark, out_dir))  # untimed warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            noop(fn(spark, out_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)),
                "fixture": f"{SCALE_COPIES}x {tag} (key-shifted)",
                "action": "noop",
                "queries": timings,
            }
        )
    )


def merge(paths: list[str]) -> None:
    legs = [json.loads(open(p).read().strip().splitlines()[-1]) for p in paths]
    legs.sort(key=lambda d: -d["cpus"])
    hi, lo = legs[0], legs[-1]
    ratios = {
        n: round(lo["queries"][n] / hi["queries"][n], 3)
        for n in hi["queries"]
        if n in lo["queries"] and hi["queries"][n] > 0
    }
    print(
        json.dumps(
            {
                "legs": legs,
                "core_ratio": round(hi["cpus"] / lo["cpus"], 2),
                "t_low_over_t_high": ratios,
                "note": "ratio >1 = query gets faster with more cores; "
                "== core_ratio would be perfect scaling",
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--merge":
        merge(sys.argv[2:])
    else:
        measure()
