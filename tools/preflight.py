#!/usr/bin/env python
"""Fast contract preflight — seconds, not minutes.

Catches the failure classes that historically cost a round's evidence
(an AnalysisException in one query, an oracle using a function this
DuckDB build lacks) WITHOUT executing anything heavy:

1. contract shape: names unique, family-prefix convention, every query
   has an oracle;
2. every oracle parses under DuckDB ``EXPLAIN`` against the real table
   schemas (sf0.001 views) — syntax + function availability + column
   resolution, no execution;
3. ``entry``'s module imports and exposes the three callables.

Usage: python tools/preflight.py   (exit 0 = clean)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from datawarehouse_backup_system_spark.queries.base import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    errors: list[str] = []

    if len(q) != len(set(q)):
        errors.append("duplicate query names")
    if set(o) - set(q):
        errors.append(f"oracles without queries: {sorted(set(o) - set(q))}")
    for n in q:
        if not re.fullmatch(r"[a-z]\d{2}_[a-z0-9_]+", n):
            errors.append(f"bad name: {n}")
        if n not in o:
            errors.append(f"no oracle: {n}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    n_ok = 0
    for name, sql in o.items():
        try:
            con.execute(f"EXPLAIN {sql}")
            n_ok += 1
        except Exception as exc:  # noqa: BLE001 — collect every failure
            errors.append(f"oracle EXPLAIN failed [{name}]: {exc}")

    for fn_name in ("entry", "queries", "oracle_sql"):
        if not callable(getattr(entrymod, fn_name, None)):
            errors.append(f"entry module lacks {fn_name}()")

    print(f"preflight: {len(q)} queries, {n_ok} oracles EXPLAIN-clean, "
          f"{len(errors)} problems")
    for e in errors:
        print("  !!", e)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
