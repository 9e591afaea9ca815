"""The written rotation plan must cover the never-gated backlog: every
registered query without a driver row (per the committed
CORRECTNESS_r*.json evidence) is either in the current top-50 gate or
in the staged next-round block of PRIORITY. Recomputed from the
artifacts, so the check stays valid as new rounds land evidence."""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_plan_covers_never_gated_backlog():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "rotation_audit.py")],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
