"""Typed casts + dirty-value repair (reference F2-F7, SURVEY §2.6).

The reference loads everything as string, then per type-class list applies
pandas coercions (``util/data_pushing.py:341-372``). Here each coercion is
a built-in Spark expression (null-on-failure semantics match pandas
``errors="coerce"``), so the whole cast layer stays inside whole-stage
codegen — no UDFs:

- F7 null scrub: literal ``'<NA>'`` / ``'nan'`` / ``''`` → NULL
  (``data_pushing.py:38-48``)
- F2 datetime: multi-format ``coalesce(try_to_timestamp(...))``
  (``data_pushing.py:346-348``)
- F3/F4 int/float: ``try_cast`` (``data_pushing.py:351-358``)
- F5 trailing-``.0`` strip on string columns — repairs numeric-inferred
  phone numbers / postal codes (``data_pushing.py:363-365``)
- F6 date-of-birth: datetime round-trip stored as 'yyyy-MM-dd' STRING
  (``data_pushing.py:368-370``; dob columns are Nullable(String) in the
  registry, table_schema.json:130)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.registry import TableSchema

#: Accepted datetime renderings, tried in order (pandas to_datetime infers
#: per-element; we enumerate the formats the exports actually use).
DEFAULT_DATETIME_FORMATS = (
    None,                    # ISO-ish default parser
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
    "dd/MM/yyyy",
    "yyyy/MM/dd",
)

NULL_LITERALS = ("<NA>", "nan", "")


def scrub_nulls(c: Column) -> Column:
    """F7: string literals that mean 'missing' become real NULLs."""
    return F.when(F.trim(c).isin(*NULL_LITERALS), F.lit(None)).otherwise(c)


def parse_timestamp(c: Column, formats: tuple[str | None, ...] = DEFAULT_DATETIME_FORMATS) -> Column:
    """F2: first format that parses wins; all fail → NULL (coerce)."""
    attempts = [
        F.try_to_timestamp(c) if fmt is None else F.try_to_timestamp(c, F.lit(fmt))
        for fmt in formats
    ]
    return F.coalesce(*attempts)


def strip_trailing_dot_zero(c: Column) -> Column:
    """F5: '33612345678.0' → '33612345678' (leading zeros preserved)."""
    return F.regexp_replace(c, r"\.0$", "")


def dob_string(c: Column, formats: tuple[str | None, ...] = DEFAULT_DATETIME_FORMATS) -> Column:
    """F6: parse as datetime, store back as 'yyyy-MM-dd' string."""
    return F.date_format(parse_timestamp(c, formats), "yyyy-MM-dd")


def apply_typed_casts(
    df: DataFrame,
    schema: TableSchema,
    formats: tuple[str | None, ...] = DEFAULT_DATETIME_FORMATS,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Cast an all-string normalized frame to the registry's types.

    ``passthrough`` columns (e.g. an already-computed ``row_hash`` or the
    ingest ``_seq``) are kept verbatim. One single ``select`` so Catalyst
    sees a flat projection (constant-folded, codegen'd, column-pruned
    against the scan).
    """
    date_cols = set(schema.date_columns)
    int_cols = set(schema.int_columns)
    float_cols = set(schema.float_columns)
    dob_cols = set(schema.dob_columns)
    keep = set(passthrough)

    exprs: list[Column] = []
    for name in df.columns:
        if name in keep:
            exprs.append(F.col(name))
            continue
        c = scrub_nulls(F.col(name))
        if name in dob_cols:
            e = dob_string(c, formats)
        elif name in date_cols:
            e = parse_timestamp(c, formats)
        elif name in int_cols:
            # pandas to_numeric accepts '3.0' for Int64; try bigint then
            # round-trip through double for decimal-rendered integers —
            # gated on the double being INTEGRAL, since an ungated
            # round-trip fabricated 3 from '3.7' instead of the
            # documented coerce-to-NULL (review r8). Both casts must be
            # try_cast: a plain cast of an overflowing double ('9e99')
            # raises under ANSI mode instead of coercing that cell.
            d = c.try_cast("double")
            e = F.coalesce(
                c.try_cast("bigint"),
                F.when(d == F.floor(d), d.try_cast("bigint")),
            )
        elif name in float_cols:
            e = c.try_cast("double")
        else:
            e = strip_trailing_dot_zero(c)
        exprs.append(e.alias(name))
    return df.select(*exprs)
