"""Audit the registry rotation against the recorded driver evidence.

The driver's correctness sweep hard-gates the FIRST 50 entries of
``queries()`` order each round (CORRECTNESS_r{N}.json). This tool
computes, from the committed CORRECTNESS files:

- which registered queries have EVER had a driver row (the gated set),
- which never have (the rotation backlog),
- how many of the current top-50 are first-ever rows (the round's new
  evidence), and
- whether the backlog is fully covered by the top-50 plus the staged
  next-round block in ``plans/registry.py`` — i.e. whether the written
  rotation plan actually exhausts the never-gated tail.

Exit 0 when the plan covers the backlog; exit 1 with the uncovered
names otherwise. Run it whenever PRIORITY changes.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gated_queries() -> dict[str, list[int]]:
    """name → rounds with a driver row, from CORRECTNESS_r*.json."""
    rounds: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        for name in json.load(open(path)):
            rounds.setdefault(name, []).append(n)
    return rounds


def staged_block() -> list[str]:
    """Names listed between the top-50 and the rotated-out section of
    PRIORITY — the written next-round staging plan (identified as the
    names after slot 50 up to the 'driver-green in an earlier round'
    comment)."""
    src = open(os.path.join(REPO, "lithops_dataframe_spark/plans/registry.py")).read()
    m = re.search(r"PRIORITY: tuple\[str, \.\.\.\] = \((.*?)\n\)\n", src, re.S)
    body = m.group(1)
    cut = body.find("driver-green in an earlier round")
    staged_src = body[:cut] if cut != -1 else body
    names = re.findall(r'"([a-z0-9_]+)"', staged_src)
    return names[50:]


def main() -> int:
    from lithops_dataframe_spark.plans import ordered_queries

    order = list(ordered_queries())
    top50 = order[:50]
    gated = gated_queries()
    never = [n for n in order if n not in gated]
    first_ever = [n for n in top50 if n not in gated]
    staged = staged_block()

    print(f"registered: {len(order)}  gated-ever: {len(gated)}  never-gated: {len(never)}")
    print(f"top-50 first-ever rows this round: {len(first_ever)}")
    for n in first_ever:
        print(f"  NEW  {n}")
    backlog = [n for n in never if n not in set(top50)]
    uncovered = [n for n in backlog if n not in set(staged)]
    print(f"backlog after this round's sweep: {len(backlog)}  staged next round: {len(staged)}")
    if uncovered:
        print("UNCOVERED (never gated, not in top-50, not staged):")
        for n in uncovered:
            print(f"  !!  {n}")
        return 1
    print("rotation plan covers the entire never-gated backlog")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
