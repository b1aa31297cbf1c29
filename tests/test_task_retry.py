"""Task-retry determinism (see tools/task_retry_proof.py).

The proof needs spark.task.maxFailures > 1, which local mode fixes at
session start — so it runs in its own subprocess session (master
local[8,2]) rather than the shared harness session. The script exits
non-zero unless (a) the planted mid-stream task fault actually fired
AND (b) the faulted run's aggregated rows byte-match the clean run's.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_planted_task_fault_does_not_change_results():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "task_retry_proof.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    # last stdout line is the JSON verdict
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no verdict line; stderr tail: {proc.stderr[-500:]}"
    verdict = json.loads(lines[-1])
    assert verdict["fault_attempts"] > 0, "planted fault never fired"
    assert verdict["rows_match"], verdict
    assert proc.returncode == 0
