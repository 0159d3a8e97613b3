"""Smoke-run every examples/*.py so the runnable narratives can't rot
(VERDICT r6 item 8): each example chains operators the contract already
verifies — this only asserts the chains still execute end to end.

All seven launch CONCURRENTLY (own JVM each, 4 cores / 2 GiB apiece) so
total added wall time is the slowest example, not the sum.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
EXAMPLES = sorted((REPO / "examples").glob("*.py"))


def test_examples_inventory():
    assert [p.name for p in EXAMPLES] == [
        "assemble_training_set.py", "curate_corpus.py", "media_pipeline.py",
        "quickstart.py", "scale_toolkit.py", "select_and_split.py",
        "table_ops.py",
    ]


def test_all_examples_run_clean(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    procs = {}
    for p in EXAMPLES:
        work = tmp_path / p.stem
        work.mkdir()
        procs[p.name] = subprocess.Popen(
            [sys.executable, str(p), str(work)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
    failed = {}
    for name, proc in procs.items():
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            proc.kill()
            failed[name] = "timeout after 600s"
            continue
        if proc.returncode != 0:
            failed[name] = out[-1500:]
    assert not failed, failed
