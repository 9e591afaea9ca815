"""Interleaved same-process A/B for optimization rounds (VERDICT r12 item 2).

This host shows ±30-50% cross-process noise, so shape comparisons are only
trustworthy when both shapes run STRICTLY INTERLEAVED inside one session:
A B A B ... — a host stall then lands on both sides, and the per-side best
(and median) compare like-for-like.

Usage:
    python tools/abq.py NAME --env VAR valA valB [--n 5] [--noop] [--out F]
    python tools/abq.py NAME --conf KEY valA valB [--n 5]

--env  VAR: builders read os.environ[VAR] at call time; each rep sets the
       side's value before building the frame.
--conf KEY: runtime SQL conf flipped via spark.conf.set between reps
       (only runtime-settable confs, e.g. spark.sql.join.preferSortMergeJoin).
--noop: time the noop sink instead of collect (guide §1.4).
--out:  append one JSON line with the full timing record (committed A/B
       artifacts live under plans/r13/).

Prints per-side all timings, best, and median. The FIRST rep of each side
is an untimed warmup (fresh codegen per shape).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lithops_dataframe_spark.plans import QUERIES  # noqa: E402
from lithops_dataframe_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    name = args.pop(0)
    mode = None
    key = va = vb = None
    n = 5
    use_noop = False
    out_path = None
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("--env", "--conf"):
            mode = a[2:]
            key, va, vb = args[i + 1], args[i + 2], args[i + 3]
            i += 4
        elif a == "--n":
            n = int(args[i + 1])
            i += 2
        elif a == "--noop":
            use_noop = True
            i += 1
        elif a == "--out":
            out_path = args[i + 1]
            i += 2
        else:
            raise SystemExit(f"unknown arg {a}")
    assert mode and key and va is not None and vb is not None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lds-abq")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    fn = QUERIES[name]

    def set_side(val: str) -> None:
        if mode == "env":
            os.environ[key] = val
        else:
            spark.conf.set(key, val)

    def run() -> float:
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()
        return time.perf_counter() - t0

    # untimed warmups, both sides
    for val in (va, vb):
        set_side(val)
        spark.sparkContext.setJobDescription(f"abq-warm:{name}:{key}={val}")
        run()

    t_a: list[float] = []
    t_b: list[float] = []
    for rep in range(n):
        for val, acc in ((va, t_a), (vb, t_b)):
            set_side(val)
            spark.sparkContext.setJobDescription(f"abq:{name}:{key}={val}:rep{rep}")
            acc.append(run())

    rec = {
        "query": name,
        "mode": mode,
        "key": key,
        "action": "noop" if use_noop else "collect",
        "n": n,
        "sides": {
            va: {"all": [round(t, 4) for t in t_a], "best": round(min(t_a), 4), "median": round(statistics.median(t_a), 4)},
            vb: {"all": [round(t, 4) for t in t_b], "best": round(min(t_b), 4), "median": round(statistics.median(t_b), 4)},
        },
    }
    for side, d in rec["sides"].items():
        print(f"{name} [{key}={side}] best={d['best']} median={d['median']} all={d['all']}")
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"-> {out_path}")


if __name__ == "__main__":
    main()
