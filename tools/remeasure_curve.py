"""Exclusive best-of-N alternating-leg re-measurement of scale-curve rows
(VERDICT r7 task 2).

Five SCALECURVE_r07 t_10x rows moved >30% vs r06 with no plan change
(while their gated sf0.1 bench times were flat or faster), and
cf_negative_sampling's exponent rose after a fix that *halved* its
t_base. This tool applies the A/B discipline from SCALE.md round-7
notes to exactly those rows: base and 10x legs ALTERNATE (so JIT warmup
and host freezes can't land on one leg), best-of-N each, through the
same noop sink bench.py uses.

Run EXCLUSIVELY — nothing else on the host (the r7 lesson: a concurrent
Spark session inflated curve rows 10-30%).

Usage: python tools/remeasure_curve.py [query ...] [--rounds N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SUSPECTS = [
    "retrieval_hybrid_rrf",
    "io_merge_upsert_partitioned",
    "graph_lpa_bandlocal",
    "sim_adc_topk_pq",
    "decontaminate_bloom_prefilter",
    "cf_negative_sampling",
]


def main() -> int:
    import math

    args = [a for a in sys.argv[1:]]
    rounds = 4
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i : i + 2]
    names = args or DEFAULT_SUSPECTS

    from bench import EXTRA_SCALE_QUERIES, SCALE_COPIES, _run_noop
    from lithops_dataframe_spark.plans import QUERIES
    from lithops_dataframe_spark.session import get_spark
    from tools.scale_fixture import build

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("remeasure-curve")
    import tempfile

    tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(tempfile.gettempdir(), f"lds_scale{SCALE_COPIES}_{tag}")
    build(spark, sf_dir, out_dir, copies=SCALE_COPIES)

    allq = {**QUERIES, **EXTRA_SCALE_QUERIES}
    results: dict[str, dict] = {}
    # one untimed warmup pass per query (both legs) so JIT/codegen costs
    # are paid before ANY timed leg, then alternate base/10x per round
    for name in names:
        fn = allq[name]
        _run_noop(fn(spark, sf_dir))
        _run_noop(fn(spark, out_dir))
        tb, t10 = [], []
        for _ in range(rounds):
            s = time.perf_counter()
            _run_noop(fn(spark, sf_dir))
            tb.append(time.perf_counter() - s)
            s = time.perf_counter()
            _run_noop(fn(spark, out_dir))
            t10.append(time.perf_counter() - s)
        b, x = min(tb), min(t10)
        results[name] = {
            "t_base": round(b, 4),
            "t_10x": round(x, 4),
            "exponent": round(math.log10(x / b) / math.log10(SCALE_COPIES), 3)
            if b > 0.05
            else None,
            "t_base_all": [round(v, 3) for v in tb],
            "t_10x_all": [round(v, 3) for v in t10],
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"rounds": rounds, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
