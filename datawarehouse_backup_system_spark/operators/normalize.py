"""Header normalization: rename, width validation, add-missing-columns.

Covers reference operators (SURVEY §2.2):

- P1 column rename with header pre-validation —
  ``util/data_processing.py:107-206``
- P2 insert missing schema columns (the reference streams the whole file
  row-by-row to splice one empty column in, ``util/data_processing.py:526-569``;
  here it is a zero-cost ``lit(NULL)`` projection)
- P3 asymmetric width validation (quirk Q4, ``main.py:166-176``): MORE
  columns than the schema → reject; FEWER → warn and backfill.

All pure projections: Catalyst collapses them into the scan, nothing
materializes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class NormalizeReport:
    """What header validation found (the reference's dict-of-success flags)."""

    ok: bool
    unknown_columns: tuple[str, ...] = ()
    missing_columns: tuple[str, ...] = ()
    error: str | None = None
    warnings: list[str] = field(default_factory=list)


def validate_headers(
    found_columns: list[str],
    expected_columns: tuple[str, ...],
    rename_map: dict[str, str] | None = None,
) -> NormalizeReport:
    """P3 width predicate, made explicit. ``expected_columns`` excludes the
    engine-generated id/row_hash (reference compares against len(schema)-2,
    main.py:166)."""
    rename_map = rename_map or {}
    canonical = [rename_map.get(c, c) for c in found_columns]
    dupes = sorted({c for c in canonical if canonical.count(c) > 1})
    if dupes:
        # duplicate canonical names (rename collision or duplicated raw
        # headers) previously passed width validation and crashed
        # normalize() later with AMBIGUOUS_REFERENCE — reject on the
        # clean ledger path instead (review r8)
        return NormalizeReport(
            ok=False,
            unknown_columns=(),
            missing_columns=(),
            error=f"duplicate canonical column names: {dupes}",
        )
    unknown = tuple(c for c in canonical if c not in expected_columns)
    missing = tuple(c for c in expected_columns if c not in canonical)
    if len(canonical) > len(expected_columns) or unknown:
        # Q4: extra columns are a hard reject (and Q6: report the *unknown*
        # columns, not the reference's misleading missing-columns message)
        return NormalizeReport(
            ok=False,
            unknown_columns=unknown,
            missing_columns=missing,
            error=f"unexpected columns not in schema: {sorted(unknown)}",
        )
    report = NormalizeReport(ok=True, missing_columns=missing)
    if missing:
        report.warnings.append(f"missing columns backfilled with NULL: {sorted(missing)}")
    return report


def normalize(
    df: DataFrame,
    expected_columns: tuple[str, ...],
    rename_map: dict[str, str] | None = None,
) -> tuple[DataFrame, NormalizeReport]:
    """P1 + P2 + P3: rename raw headers to canonical names, validate width,
    backfill missing columns as NULL string, project to schema order.

    Returns (normalized_df, report); on rejection the df is returned
    unchanged and report.ok is False — callers ledger the failure.
    """
    report = validate_headers(df.columns, expected_columns, rename_map)
    if not report.ok:
        return df, report
    out = df
    applicable = {k: v for k, v in (rename_map or {}).items() if k in df.columns}
    if applicable:
        out = out.withColumnsRenamed(applicable)
    for c in report.missing_columns:
        out = out.withColumn(c, F.lit(None).cast("string"))
    out = out.select(*expected_columns)
    return out, report
