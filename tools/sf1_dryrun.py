"""sf1-equivalent dry-run of the heaviest end-to-end pipeline
compositions (VERDICT r9 task 6).

The committed scale curve (SCALECURVE_r*.json) measures every family at
sf0.1-equivalents (10 key-shifted copies of sf0.01). This tool pushes
one decade further: it builds 10 key-shifted copies of **sf0.1** — an
sf1-equivalent fixture, ~6 M lineitem-scale rows / ~600 k documents —
and times the end-to-end pipeline compositions on both legs with the
curve's own methodology (untimed warmup on both legs, alternating
base/10× rounds, best-of-N, noop sink), reporting the measured
sf0.1→sf1 scaling exponent per query.

Run EXCLUSIVELY (no concurrent Spark sessions — curve rows inflate
10-30% otherwise; memory: round-cadence notes).

Output: one JSON line; committed snapshot lives at SF1DRYRUN_r{N}.json
with prose in SCALE.md.

Semantics caveats at 10× (documented, not bugs):
- dedup_minhash_lsh_pairs mines near-dup PAIRS; 10 identical text
  copies inflate the OUTPUT quadratically per duplicate cluster
  (legitimately ~45× the pairs), so its exponent reflects output
  volume, not plan misbehavior — same exclusion the committed curve
  applies to cross-row pair mining.
- pipeline_traindata_manifest starts with a quality gate + EXACT dedup:
  the 10 copies collapse to ~base cardinality after the dedup stage by
  construction, so the measurement exercises 10× scan/fingerprint/agg
  work front-loaded onto base-sized downstream stages — exactly what a
  recrawl-heavy production corpus does.
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
QUERIES = [
    "pipeline_traindata_manifest",
    "pipeline_clean_corpus",
    "dedup_minhash_lsh_pairs",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    from lithops_dataframe_spark.plans import QUERIES as Q
    from lithops_dataframe_spark.session import get_spark
    from tools.scale_fixture import build

    spark = get_spark("sf1-dryrun")
    tag = os.path.basename(BASE_SF_DIR.rstrip("/"))
    out_dir = os.path.join(tempfile.gettempdir(), f"lds_scale{COPIES}_{tag}")
    t0 = time.perf_counter()
    build(spark, BASE_SF_DIR, out_dir, copies=COPIES)
    build_s = round(time.perf_counter() - t0, 2)

    per_q: dict[str, dict] = {}
    for name in QUERIES:
        fn = Q[name]
        _noop(fn(spark, BASE_SF_DIR))  # warmup both legs, untimed
        _noop(fn(spark, out_dir))
        tb, tx = [], []
        for _ in range(2):
            s = time.perf_counter()
            _noop(fn(spark, BASE_SF_DIR))
            tb.append(time.perf_counter() - s)
            s = time.perf_counter()
            _noop(fn(spark, out_dir))
            tx.append(time.perf_counter() - s)
        b, x = min(tb), min(tx)
        per_q[name] = {
            "sf0.1_sec": round(b, 3),
            "sf1eq_sec": round(x, 3),
            "exponent": round(math.log10(x / b), 3) if b > 0.05 else None,
        }
        print(f"  {name}: base {b:.2f}s  sf1eq {x:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "sf1_dryrun",
                "base": BASE_SF_DIR,
                "copies": COPIES,
                "fixture_build_sec": build_s,
                "queries": per_q,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
