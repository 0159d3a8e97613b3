"""Regression pins for the four round-9 ADVICE items fixed in round 10
(each named in the fix commit)."""

from __future__ import annotations

import errno
import os
import re
from pathlib import Path


def test_pagerank_tol_digits_forces_staged_tier(spark):
    """ADVICE r9 (graph.py:113): tol_digits below the unroll threshold
    was silently ignored — a fixed-round run masqueraded as a
    convergence-stopped one. Now tol_digits forces the staged tier, so
    the early stop actually runs: with tol_digits=0 every rank rounds
    to the same coarse value, the signature repeats at round 2, and the
    result equals the 2-iteration fixed run — NOT the 5-iteration one."""
    from datawarehouse_backup_system_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src int, dst int"
    )

    def ranks(df):
        return {r["node"]: r["rank"] for r in df.collect()}

    got = ranks(pagerank(edges, iterations=5, tol_digits=0))
    two = ranks(pagerank(edges, iterations=2))
    five = ranks(pagerank(edges, iterations=5))
    assert got == two
    assert got != five  # the stop changed the outcome; ignoring it would not


def test_staged_round_root_clears_est_dirs(tmp_path):
    """ADVICE r9 (graph.py:312): re-entry cleared only r<N> round dirs,
    leaving a prior neighborhood_function run's est_r<N> estimate dirs
    to silently mix into a shallower re-run's held result."""
    from datawarehouse_backup_system_spark.operators.graph import (
        _staged_round_root,
    )

    root = tmp_path / "stage"
    for d in ("r1", "r7", "est_r2", "est_r11", "keep_me"):
        (root / d).mkdir(parents=True)
    got = _staged_round_root(str(root), "pin-")
    assert got == str(root)
    left = sorted(p.name for p in root.iterdir())
    assert left == ["keep_me"]  # unrelated data untouched, all rounds gone


def test_bench_retry_ignores_soft_budget():
    """ADVICE r9 (bench.py:380): a retry admitted under the hard budget
    could be soft-degraded to single-run mid-attempt, producing a
    lower-quality attempt than the noisy one it was meant to replace.
    The retry closure is main()-local, so pin the source contract: the
    retry call passes ignore_soft=True and the runs decision honors it."""
    src = Path(__file__).resolve().parents[1] / "bench.py"
    text = src.read_text()
    assert "_run_attempt(ignore_soft=True)" in text
    assert re.search(
        r"runs = 1 if \(elapsed > soft_budget and not ignore_soft\)", text
    )


def test_lease_release_restores_thief_when_link_unsupported(
    tmp_path, monkeypatch
):
    """ADVICE r9 (table_format.py:259): on filesystems without hard
    links, the thief's lease was displaced to a diagnostic name and the
    canonical path left EMPTY while the thief believed it held the
    lease — a third writer could acquire concurrently. Non-EEXIST link
    failures now fall back to an atomic rename restore."""
    from datawarehouse_backup_system_spark.plans.table_format import (
        WriterLease,
    )

    lease_path = tmp_path / "_writer.lease"
    mine = WriterLease(tmp_path, owner="me", ttl_s=9999)
    mine.acquire()
    # simulate a steal: the thief's token now sits at the canonical path
    lease_path.write_text("thief")

    real_link = os.link

    def no_link(src, dst, **kw):
        raise OSError(errno.EPERM, "hard links not supported")

    monkeypatch.setattr(os, "link", no_link)
    mine.release()
    monkeypatch.setattr(os, "link", real_link)
    assert lease_path.read_text() == "thief"  # restored, not displaced
    assert not list(tmp_path.glob("*.displaced.*"))
    assert not list(tmp_path.glob("_writer.lease.release.*"))


def test_lease_release_eexist_still_displaces(tmp_path, monkeypatch):
    """Companion pin: when link fails with EEXIST a NEWER lease already
    landed at the canonical path — the displace-to-diagnostic move must
    stay (restoring would clobber the newer holder)."""
    from datawarehouse_backup_system_spark.plans.table_format import (
        WriterLease,
    )

    lease_path = tmp_path / "_writer.lease"
    mine = WriterLease(tmp_path, owner="me", ttl_s=9999)
    mine.acquire()
    lease_path.write_text("thief")

    def link_eexist(src, dst, **kw):
        # a newer lease raced in between our rename and the restore
        lease_path.write_text("newer")
        raise OSError(errno.EEXIST, "exists")

    monkeypatch.setattr(os, "link", link_eexist)
    mine.release()
    assert lease_path.read_text() == "newer"  # newer holder untouched
    displaced = list(tmp_path.glob("*.displaced.*"))
    assert len(displaced) == 1 and displaced[0].read_text() == "thief"
