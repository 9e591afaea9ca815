"""One-command first-contact pre-gate (VERDICT r7 task 4).

Computes the round's first-contact-risk set straight from the registry
order and the committed driver evidence — no hand-maintained list:

- every top-50 query with NO row in any CORRECTNESS_r*.json (the names
  the driver will gate for the first time this round), plus
- the staged next-round block (names 51+ above the rotated-out tail),

then runs ``tools/driver_sim.py`` on exactly that set under the
driver-shaped session. This is the closing-checklist command that proves
documented first-contact-risk coverage before a round ends; the full
driver_sim run stays the whole-registry parity gate.

Usage: python tools/pregate.py [--list] [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rotation_audit import gated_queries, staged_block  # noqa: E402


def first_contact_set() -> list[str]:
    from lithops_dataframe_spark.plans import ordered_queries

    order = list(ordered_queries())
    gated = gated_queries()
    risk = [n for n in order[:50] if n not in gated]
    risk += [n for n in staged_block() if n not in gated and n not in set(risk)]
    return risk


def main() -> int:
    args = sys.argv[1:]
    names = first_contact_set()
    print(f"first-contact-risk set ({len(names)} queries):")
    for n in names:
        print(f"  {n}")
    if "--list" in args:
        return 0
    if not names:
        print("nothing never-gated — pre-gate trivially green")
        return 0
    env = dict(os.environ, LDS_ONLY=",".join(names))
    cmd = [sys.executable, "tools/driver_sim.py"] + [a for a in args if a != "--list"]
    return subprocess.call(cmd, env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


if __name__ == "__main__":
    raise SystemExit(main())
