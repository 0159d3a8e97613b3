"""Driver-contract guards: keys align, entry() produces rows, names stay
stable (the oracle VALUES are checked by tools/check_oracle.py; this
pins the contract shape so refactors can't silently break the driver)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # r7 consolidation: 161 -> 136 (17 definite + 8 candidate folds per
    # COVERAGE.md; parity pinned in tests/test_folded_twins.py) + a08
    # (r7) + g03/g04/w05 (r8) — the floor tracks len(queries()) at HEAD
    # so deleting any spec trips a test (VERDICT r7 item 4)
    assert len(q) >= 148
    # every query is oracle-checked (q30's sketches compare against
    # exact counts via tolerance booleans since round 2)
    assert set(q) - set(o) == set()


def test_query_names_and_callables():
    q = entry_mod.queries()
    assert all(callable(f) for f in q.values())
    # stable naming convention: family prefix + snake_case
    import re

    assert all(re.fullmatch(r"[qdtmrsfkuecizgawbpxvhy]\d{2}_[a-z0-9_]+", n) for n in q)


def test_entry_runs_on_smoke_sf(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order",
    ]


def test_rotation_prioritizes_latest_round_failures():
    """A query whose most recent driver row was red (error/mismatch) must
    re-enter the 50-slot verification window immediately — ahead of the
    never-verified backlog."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    rounds = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int("".join(filter(str.isdigit, p.stem))),
    )
    if not rounds:
        return  # fresh clone without driver artifacts
    latest = json.loads(rounds[-1].read_text())
    red = {
        n for n, row in latest.items()
        if row.get("err") is not None or row.get("hash_match") is False
    }
    window = list(entry_mod.queries())[:50]
    missing = red - set(window)
    assert not missing, f"red queries outside the window: {sorted(missing)}"


def test_every_oracle_parses_under_duckdb_explain():
    """Syntax/function/column drift in an oracle must fail CI in seconds,
    not surface as a dead correctness row at round end (the r3 lesson:
    one load() type error nulled 18 rows). EXPLAIN parses + binds against
    the real table schemas without executing."""
    import duckdb

    from datawarehouse_backup_system_spark.queries.base import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            bad.append(f"{name}: {exc}")
    assert not bad, bad
