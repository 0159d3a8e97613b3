#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__.py`` on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares:
row count, column-name set, and order-insensitive values (exact, with a
float-closeness fallback reported separately so we can see whether a
strict value-hash would pass).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from datawarehouse_backup_system_spark.queries.base import TABLES  # noqa: E402
from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402


def _tz_aware_cols(df: pd.DataFrame) -> set:
    return {
        c
        for c in df.columns
        if pd.api.types.is_datetime64_any_dtype(df[c])
        and getattr(df[c].dtype, "tz", None) is not None
    }


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def compare(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, bool, str]:
    """Returns (exact_match, close_match, message).

    The driver's value hash is representation-sensitive: a Spark BIGINT
    column vs a DuckDB HUGEINT (rendered float64 by fetchdf) hash-differ
    even when the values coerce equal.  So dtype-KIND divergence (int vs
    float, etc.) is a hard failure here, before any value coercion.
    """
    if len(a) != len(b):
        return False, False, f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return False, False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    # tz-awareness divergence is a HARD failure like the dtype-kind
    # check (review r11): canon() equalizes tz-aware and naive
    # timestamps, but the driver's value hash is representation-
    # sensitive ('…+00:00' vs naive render) — exactly the local-green/
    # driver-red blind spot this tool exists to prevent
    tza, tzb = _tz_aware_cols(a), _tz_aware_cols(b)
    if tza != tzb and len(a) > 0:
        return False, False, (
            f"tz-awareness divergence: spark {sorted(tza)} vs oracle "
            f"{sorted(tzb)} — driver hash would mismatch"
        )
    a, b = canon(a), canon(b)
    exact = True
    close = True
    msg = []
    for c in a.columns:
        av, bv = a[c], b[c]
        ka, kb = _kind(av), _kind(bv)
        if ka != kb and not (len(a) == 0):
            exact = False
            close = False
            msg.append(f"{c}: dtype kind {ka} (spark) vs {kb} (oracle) — "
                       "driver hash would mismatch")
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            import numpy as _np

            avf = av.astype(float)
            bvf = bv.astype(float)
            # -0.0 == 0.0 under ==, but the driver's hash renders them
            # differently (review r11): compare sign bits on zeros too
            sign_mismatch = (
                (avf == 0.0)
                & (bvf == 0.0)
                & (_np.signbit(avf.to_numpy()) != _np.signbit(bvf.to_numpy()))
            )
            eq = ((avf == bvf) & ~sign_mismatch) | (avf.isna() & bvf.isna())
            if not eq.all():
                exact = False
                diff = (avf - bvf).abs()
                cl = (diff < 1e-6) | (avf.isna() & bvf.isna())
                if not cl.all():
                    close = False
                    i = (~cl).idxmax()
                    msg.append(f"{c}: value mismatch at row {i}: {avf[i]} vs {bvf[i]}")
                else:
                    i = (~eq).idxmax()
                    msg.append(f"{c}: float-only diff e.g. {avf[i]} vs {bvf[i]}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                exact = False
                close = False
                i = (~eq).idxmax()
                msg.append(f"{c}: mismatch at row {i}: {av[i]!r} vs {bv[i]!r}")
    return exact, close, "; ".join(msg) or "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd name used to be silently skipped, printing 'all
        # queries match' on zero runs — a false green gate (review r8)
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():
            # Spark-written directory-style table (make_scaled_sf.py
            # output): DuckDB needs the part-file glob, else the view
            # binding raises IOException and zero queries run
            # (review r11 — the scaled sf could never be oracle-checked)
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark(app_name="check-oracle")
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            if len(sdf) == 0:
                # the driver's weaker rows-only check requires rows>0;
                # a green local gate over 0 rows was a false pass
                # (review r11)
                failures.append(name)
                print(f"FAIL  rows-only {name}: 0 rows")
            else:
                print(
                    f"rows-only  {name}: {len(sdf)} rows "
                    f"({time.time()-t0:.1f}s)"
                )
            continue
        try:
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            hazard = [
                f"{row[0]}:{row[1]}" for row in desc
                if row[1].upper() in ("HUGEINT", "UHUGEINT", "INT128")
            ]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb describe error: {exc}")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        exact, close, msg = compare(sdf, ddf)
        if hazard:
            exact = False
            close = False
            msg = (msg + "; " if msg and msg != "ok" else "") + (
                f"oracle column(s) typed HUGEINT — driver hash will fail: {hazard}"
            )
        status = "EXACT" if exact else ("CLOSE" if close else "FAIL")
        if not exact:
            failures.append(name)
        print(f"{status}  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)  {msg if not exact else ''}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
