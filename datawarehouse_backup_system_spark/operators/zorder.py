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


def morton_interleave_sql(cols: list[str], bits: int) -> str:
    """The DuckDB replay of :func:`morton_code` — same bit layout (bit
    j of column i at position j*k + i), generated from ONE place so a
    layout change can never leave an oracle checking different code
    (review r8: z01 and z02 each carried a hand-synced copy)."""
    k = len(cols)
    terms = [
        f"((({col} >> {j}) & 1) << {j * k + i})"
        for i, col in enumerate(cols)
        for j in range(bits)
    ]
    return " | ".join(terms)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
    code_col: str = "_zcode",
) -> DataFrame:
    """Cluster a frame for write-out: range-partition + in-partition
    sort by the Morton code of ``cols``, each column first bucketed
    into [0, 2^bits) by min/max linear scaling. Each output file then
    covers a small hyper-rectangle of the space, so min/max stats prune
    multi-column predicates.

    Scaling, not pmod (review r8): pmod WRAPS — an id or cents column
    whose range exceeds 2^bits maps far-apart values onto the same
    Morton coordinate, every file spans the wrapped domain, and the
    operator silently delivers zero data skipping exactly on the
    wide-range columns it is pointed at. The min/max probe is one
    1-row aggregate over the frame — a bounded extra job at
    compaction time. NULLs sort together (NULL bucket → NULL code),
    same as before.

    One range shuffle (sampling pass + exchange) and a per-partition
    sort — the same cost as any ORDER BY write, paid at compaction time,
    amortized over every pruned read after.
    """
    probes = []
    for c in cols:
        probes.append(F.min(F.col(c).cast("bigint")).alias(f"_mn_{c}"))
        probes.append(F.max(F.col(c).cast("bigint")).alias(f"_mx_{c}"))
    row = df.agg(*probes).first()
    lim = 1 << bits
    scaled = []
    for c in cols:
        mn = row[f"_mn_{c}"]
        mx = row[f"_mx_{c}"]
        if mn is None:  # empty frame / all-NULL column
            mn, mx = 0, 0
        # driver-side integer step: ceil(span / 2^bits), never 0 —
        # (value - min) div step lands in [0, 2^bits) with no wrap
        # and no 64-bit overflow (no multiplication of wide ranges)
        step = max(1, -((mn - mx - 1) // lim))
        scaled.append(
            F.expr(f"(CAST(`{c}` AS BIGINT) - {mn}) div {step}")
        )
    code = morton_code(scaled, bits)
    staged = df.withColumn(code_col, code)
    parts = n_partitions or staged.rdd.getNumPartitions()
    return (
        staged.repartitionByRange(parts, F.col(code_col))
        .sortWithinPartitions(code_col)
    )
