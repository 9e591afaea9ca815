"""Warm per-query timer: run NAME(s) N times each on sf0.1, print best/median."""
import os, sys, time, statistics
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lithops_dataframe_spark.session import get_spark
from lithops_dataframe_spark.plans.registry import QUERIES
import lithops_dataframe_spark.plans  # noqa: F401

def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(os.environ.get("N", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lds-timeq")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # untimed warmup: first pass runs 3-14x hot (JIT/codegen) — never let N=1 record it
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: best={min(ts):.3f} median={statistics.median(ts):.3f} all={[round(t,3) for t in ts]}")

if __name__ == "__main__":
    main()
