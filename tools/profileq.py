"""Per-query profiler for the optimization rounds: for each NAME, run the
builder on sf0.1, print (a) wall time of the bench action (collect), (b)
noop-sink time (computation only, guide §1.4), (c) the number of Spark jobs
the builder+action fired, and optionally dump `.explain("formatted")` to
plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/profileq.py [--explain plans/r12 --suffix before] NAME...
Env: N (timed reps, default 3), SPARK_GRAFT_SF_DIR.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lithops_dataframe_spark.plans import QUERIES  # noqa: E402
from lithops_dataframe_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    suffix = "before"
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    n = int(os.environ.get("N", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lds-profileq")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()

    tracker = sc.statusTracker()
    for name in names:
        fn = QUERIES[name]
        sc.setJobDescription(f"profile:{name}")
        fn(spark, sf_dir).collect()  # untimed warmup
        # timed collect (bench action shape)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        # job count for one build+collect
        nj0 = max(tracker.getJobIdsForGroup(None) or [0])
        fn(spark, sf_dir).collect()
        nj1 = max(tracker.getJobIdsForGroup(None) or [0])
        # noop-sink timing (computation only)
        tn = []
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            tn.append(time.perf_counter() - t0)
        print(
            f"{name}: collect best={min(ts):.3f} all={[round(t, 3) for t in ts]} "
            f"noop best={min(tn):.3f} jobs={nj1 - nj0}"
        )
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(explain_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"  plan -> {path}")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
