"""sf1-equivalent dry-run of the RETRIEVAL/SERVING leg (VERDICT r11
task 4): the last heavy family with only curve-level evidence.

Batch pipelines (r10, SF1DRYRUN_r10.json) and streaming dedup (r11,
SF1DRYRUN_STREAM_r11.json) have measured decades; this tool gives the
serving family its own, in two parts:

1. **Gated queries end-to-end** — `sim_ivfpq_topk` and
   `retrieval_rerank_features` at sf0.1 vs the 10× key-shifted
   sf1-equivalent corpus. Each is timed COLD (first call in the session:
   trains the coarse quantizer + PQ codebooks / builds the candidate
   pool) and WARM (best-of-2 after the cold call: codebooks are memoized
   per fixture — the production split, where training is an offline
   one-time job and serving pays only assignment + scoring). cold−warm
   approximates the trainer share; the warm exponent is the serving-path
   scaling the curve claims.

2. **The IVF design claim, measured** — "per-query serving cost is
   independent of corpus size" holds when cell count scales with the
   corpus (constant expected cell size), the index is STORED partitioned
   by cell, and query routing happens against the driver-resident
   centroid matrix (the production vector-store layout). This leg builds
   exactly that: kmeans-trained centroids (k = 8 at sf0.1, k = 80 at the
   10× leg), a cell-partitioned parquet index of (id, embedding), probes
   computed driver-side (n_probe nearest centroids per query — the
   router's in-memory matrix, NOT a cluster job), then serving = a
   STATIC partition-pruned scan of the probed cells only + exact cosine
   re-rank of those candidates. Timed: train (one-time), index build
   (one-time), serving (warmup + best-of-3). Expected: train/index grow
   ~linearly with the corpus; serving stays ~FLAT because the pruned
   scan touches n_probe × E[cell size] rows regardless of corpus size.
   A serving ratio well above ~2× would falsify the layout claim.

Run EXCLUSIVELY (no concurrent Spark sessions — memory: curve rows
inflate 10-30% otherwise). Output: one JSON line; committed snapshot
lives at SF1DRYRUN_SERVE_r{N}.json with prose in SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
GATED = ["sim_ivfpq_topk", "retrieval_rerank_features"]
N_PROBE = 2
N_QUERIES = 8
TOP_K = 10
IVF_ITERS = 3
#: base cell count; the 10x leg uses COPIES * this (constant E[cell size])
BASE_CELLS = 8


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_query(fn, spark, sf_dir: str, reps: int) -> list[float]:
    out = []
    for _ in range(reps):
        s = time.perf_counter()
        _noop(fn(spark, sf_dir))
        out.append(time.perf_counter() - s)
    return out


def _gated_leg(Q, spark, sf_dir: str) -> dict:
    res = {}
    for name in GATED:
        cold = _time_query(Q[name], spark, sf_dir, 1)[0]
        warm = min(_time_query(Q[name], spark, sf_dir, 2))
        res[name] = {
            "cold_sec": round(cold, 3),
            "warm_sec": round(warm, 3),
            "trainer_share_sec": round(max(cold - warm, 0.0), 3),
        }
        print(f"  {name}: cold {cold:.2f}s warm {warm:.2f}s", file=sys.stderr)
    return res


def _ivf_flat_leg(spark, sf_dir: str, n_cells: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from lithops_dataframe_spark.catalog import load_table
    from lithops_dataframe_spark.operators import similarity as S
    from lithops_dataframe_spark.operators.clustering import assign_cells, kmeans_fit

    emb = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))

    # ONE-TIME: train the coarse quantizer (offline job in production)
    t0 = time.perf_counter()
    centroids, _ = kmeans_fit(emb, k=n_cells, iterations=IVF_ITERS)
    train_s = time.perf_counter() - t0

    # ONE-TIME: materialize the cell-partitioned index — the vector-store
    # layout: one partition directory per cell, so a probed read is a
    # partition-pruned scan, never a full-index pass
    index_dir = tempfile.mkdtemp(prefix="lds_ivf_index_")
    t0 = time.perf_counter()
    assign_cells(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb")),
        centroids,
        emb_col="emb",
    ).select("id", "emb", "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(index_dir)
    index_s = time.perf_counter() - t0

    # ROUTER (driver-side): the centroid matrix lives in the serving
    # process; probes per query are n_cells dot products in memory
    qrows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )

    def _cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return dot / (na * nb) if na > 0 and nb > 0 else float("-inf")

    probes = []  # (query_id, cell)
    for r in qrows:
        sims = sorted(
            ((-_cos(r["embedding"], c), i) for i, c in enumerate(centroids))
        )[:N_PROBE]
        probes.extend((int(r["vec_id"]), int(i)) for _, i in sims)
    probed_cells = sorted({c for _, c in probes})

    qframe = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, q_emb array<float>",
    )
    pframe = spark.createDataFrame(probes, "query_id long, cell int")

    def serve():
        idx = spark.read.parquet(index_dir)
        # static partition pruning: only the probed cells' files are read
        cand = idx.filter(F.col("cell").isin([int(c) for c in probed_cells]))
        scored = (
            cand.join(F.broadcast(pframe), "cell")
            .join(F.broadcast(qframe), "query_id")
            .filter(F.col("id") != F.col("query_id"))
            .select(
                "query_id",
                "id",
                S.cosine(F.col("q_emb"), F.col("emb")).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc_nulls_last(), F.col("id").asc()
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
        )

    _noop(serve())  # untimed warmup
    serve_s = min(_time_query(lambda *_: serve(), spark, sf_dir, 3))
    return {
        "n_cells": n_cells,
        "train_sec": round(train_s, 3),
        "index_build_sec": round(index_s, 3),
        "serve_sec": round(serve_s, 3),
        "n_probed_cells": len(probed_cells),
    }


def main() -> int:
    from lithops_dataframe_spark.plans import QUERIES as Q
    from lithops_dataframe_spark.session import get_spark
    from tools.scale_fixture import build

    spark = get_spark("sf1-dryrun-serve")
    tag = os.path.basename(BASE_SF_DIR.rstrip("/"))
    out_dir = os.path.join(tempfile.gettempdir(), f"lds_scale{COPIES}_{tag}")
    t0 = time.perf_counter()
    build(spark, BASE_SF_DIR, out_dir, copies=COPIES)
    build_s = round(time.perf_counter() - t0, 2)

    # session JIT warmup at the smallest SF (bench.py's methodology): the
    # codebook memo is keyed per fixture dir, so this warms codegen/JIT
    # for the plan shapes WITHOUT pre-training the measured legs — the
    # "cold" rows below then measure training, not first-call compilation
    warm_sf = os.path.join(os.path.dirname(BASE_SF_DIR.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_sf):
        for name in GATED:
            _noop(Q[name](spark, warm_sf))

    print("gated queries, base leg:", file=sys.stderr)
    gated_base = _gated_leg(Q, spark, BASE_SF_DIR)
    print("gated queries, sf1-equivalent leg:", file=sys.stderr)
    gated_10x = _gated_leg(Q, spark, out_dir)

    print("IVF-flat serving, base leg:", file=sys.stderr)
    ivf_base = _ivf_flat_leg(spark, BASE_SF_DIR, BASE_CELLS)
    print("IVF-flat serving, sf1-equivalent leg:", file=sys.stderr)
    ivf_10x = _ivf_flat_leg(spark, out_dir, BASE_CELLS * COPIES)

    def _exp(b, x):
        return round(math.log10(x / b), 3) if b and b > 0.05 else None

    out = {
        "metric": "sf1_dryrun_serve",
        "base": BASE_SF_DIR,
        "copies": COPIES,
        "fixture_build_sec": build_s,
        "gated": {
            name: {
                "base": gated_base[name],
                "sf1eq": gated_10x[name],
                "warm_exponent": _exp(
                    gated_base[name]["warm_sec"], gated_10x[name]["warm_sec"]
                ),
                "cold_exponent": _exp(
                    gated_base[name]["cold_sec"], gated_10x[name]["cold_sec"]
                ),
            }
            for name in GATED
        },
        "ivf_flat": {
            "base": ivf_base,
            "sf1eq": ivf_10x,
            "serve_ratio_10x_over_base": round(
                ivf_10x["serve_sec"] / ivf_base["serve_sec"], 3
            )
            if ivf_base["serve_sec"] > 0
            else None,
            "train_ratio_10x_over_base": round(
                ivf_10x["train_sec"] / ivf_base["train_sec"], 3
            )
            if ivf_base["train_sec"] > 0
            else None,
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
