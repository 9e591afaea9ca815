"""Bench regression guard: compare a bench JSON line against a prior
round's recorded BENCH_r{N}.json and flag per-query regressions.

Usage:
    python bench.py | tail -1 > /tmp/bench_now.json
    python tools/bench_compare.py /tmp/bench_now.json BENCH_r01.json [ratio]

Exits nonzero if any query common to both runs is slower than `ratio`
(default 2.0) times its old value — the same threshold the round verdict
applies. Queries present in only one file are listed but never fail the
check (coverage growth is not a regression).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(path: str) -> dict:
        d = json.load(open(path))
        # driver-recorded BENCH_r{N}.json wraps the bench line under "parsed"
        return d.get("parsed", d)

    now = load(sys.argv[1])
    old = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    qn, qo = now.get("queries", {}), old.get("queries", {})
    common = sorted(set(qn) & set(qo))
    bad = []
    for name in common:
        r = qn[name] / qo[name] if qo[name] > 0 else float("inf")
        flag = "REGRESSION" if r > ratio else "ok"
        if r > ratio:
            bad.append(name)
        print(f"{flag:10s} {name:40s} {qo[name]:8.2f}s -> {qn[name]:8.2f}s  ({r:5.2f}x)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"new-only ({len(only_new)}): {', '.join(only_new)}")
    print(f"common total: {sum(qo[n] for n in common):.2f}s -> {sum(qn[n] for n in common):.2f}s")
    print(f"regressions (> {ratio}x): {len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
