"""Z-order (Morton) clustering for multi-column data skipping.

Public lakehouse technique (Delta OPTIMIZE ZORDER / Iceberg sort
orders): interleaving the bits of several columns gives a 1-D sort key
whose ranges are small hyper-rectangles in N-D space, so parquet
row-group min/max stats prune scans on ANY prefix-free combination of
the clustered columns — not just the leading column of a lexicographic
sort.

Everything here is integer bit arithmetic (shift/and/or expressions):
codegen'd, engine-portable (the z01 query is DuckDB-oracle-checked),
and the layout write is ONE range shuffle + in-partition sort — the
standard compaction-time cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (must already be
    non-negative ints; callers bucket/clamp first): with k columns, bit
    j of column i lands at position j*k + i. 2 cols × 16 bits → 32-bit
    code; k*bits must fit a signed long (≤ 62)."""
    k = len(cols)
    if k < 2:
        raise ValueError("morton_code needs >= 2 columns")
    if k * bits > 62:
        raise ValueError("k * bits must be <= 62 to fit a signed long")
    code = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = c.cast("bigint")
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, j * k + i))
    return code


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
    code_col: str = "_zcode",
) -> DataFrame:
    """Cluster a frame for write-out: range-partition + in-partition
    sort by the Morton code of ``cols`` (clamped to ``bits`` via
    pmod — callers wanting true value order should pre-bucket to ranks).
    Each output file then covers a small hyper-rectangle of the space,
    so min/max stats prune multi-column predicates.

    One range shuffle (sampling pass + exchange) and a per-partition
    sort — the same cost as any ORDER BY write, paid at compaction time,
    amortized over every pruned read after.
    """
    lim = F.lit(1 << bits)
    code = morton_code(
        [F.pmod(F.col(c).cast("bigint"), lim) for c in cols], bits
    )
    staged = df.withColumn(code_col, code)
    parts = n_partitions or staged.rdd.getNumPartitions()
    return (
        staged.repartitionByRange(parts, F.col(code_col))
        .sortWithinPartitions(code_col)
    )
