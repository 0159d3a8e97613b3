"""Content hashing: the canonical ``row_hash`` dedup key.

Reference F1 (``util/data_processing.py:477``) hashes the Python ``repr``
of the post-rename cell list — an accident of implementation (quirk Q5).
Per SURVEY decision D2 we define a canonical, engine-portable form:

    row_hash = md5( concat_ws('\\x01', coalesce(col, '<NULL>') ...) )

over an explicit column order. Same information content (every cell value,
null-distinguishing, order-sensitive), same 32-hex output type, computed
entirely JVM-side inside whole-stage codegen. Correctness checks assert
dedup *semantics* (which rows survive), not hash bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SEP = "\x01"
NULL_SENTINEL = "<NULL>"


def row_hash_col(columns: list[str]) -> Column:
    """MD5 content key over the given columns (string-cast, null-safe)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in columns]
    return F.md5(F.concat_ws(HASH_SEP, *parts))


def with_row_hash(df: DataFrame, columns: list[str] | None = None, out: str = "row_hash") -> DataFrame:
    """Append the content hash (reference appends row_hash as the last
    column, data_processing.py:463-464)."""
    cols = columns if columns is not None else [c for c in df.columns if c not in ("id", out)]
    return df.withColumn(out, row_hash_col(cols))


def md5_prefix_long(col: Column) -> Column:
    """Portable 56-bit integer from md5's first 14 hex chars.

    THE single definition of the repo's cross-engine hash recipe — every
    operator that needs an integer hash key (bucketing, span/shingle
    keys) must derive from this so the DuckDB replay
    (``('0x' || substr(md5(x),1,14))::BIGINT``) stays bit-identical
    everywhere; a prefix-width change happens here or nowhere.

    Known FROZEN exceptions (predate this rule and are pinned by
    shipped driver hashes + their own oracle SQL — changing them now
    would invalidate recorded evidence for zero benefit):
    ``sampling._bucket`` (8-hex prefix % 1e6 buckets, w01/t12/t18) and
    ``curation.leakage_safe_split`` (8-hex % 100, t23). New code must
    NOT add further variants.
    """
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def hex_prefix_long(hex_col: Column) -> Column:
    """56-bit integer from the first 14 chars of an EXISTING hex digest
    (e.g. a staged ``row_hash``) — same uniformity as
    :func:`md5_prefix_long` without re-hashing the digest. DuckDB replay:
    ``('0x' || substr(x, 1, 14))::BIGINT``."""
    return F.conv(F.substring(hex_col, 1, 14), 16, 10).cast("bigint")


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Uniform bucket 0..n_buckets-1 from :func:`md5_prefix_long`.

    ``pmod`` guards the (impossible for a 56-bit prefix, but cheap)
    negative case so the bucket id is non-negative on both engines.
    """
    return F.pmod(md5_prefix_long(col), F.lit(n_buckets)).cast("bigint")
