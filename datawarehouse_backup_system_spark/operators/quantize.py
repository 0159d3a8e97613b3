"""Embedding quantization for large-vector-corpus storage/ANN.

Scalar (per-vector min/max) int8 quantization — the standard 4× memory
reduction applied before an embedding corpus is indexed (FAISS
``SQ8``-style, public recipe). Everything is expression-level array
math (``transform`` / ``zip_with`` / ``aggregate``): no UDFs, runs
per-row inside the scan projection, zero shuffles — at 100 TB the
quantization pass is a straight map over the corpus and writes 1/4 the
bytes.

Engine-portability contract (these queries are DuckDB-oracle-checked):
- compute in float64 (the float32→double cast is exact),
- quantize with ``floor(z + 0.5)`` (identical on every engine; plain
  ``round()`` half-up vs half-even differs between engines),
- the quantized codes and their sums are exact integers — hash-stable;
  only reconstruction-error columns need fixed rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, bits: int = 8
) -> DataFrame:
    """Per-vector scalar quantization to ``bits`` (default int8).

    Output per vector: the integer code array ``q`` (0..2^bits-1), the
    dequantization parameters (``q_min``, ``q_scale``), and the max
    absolute reconstruction error. A zero-range vector (scale 0)
    quantizes to all-zero codes and reconstructs exactly.
    """
    levels = (1 << bits) - 1
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_min(v).alias("q_min"),
        ((F.array_max(v) - F.array_min(v)) / levels).alias("q_scale"),
    )
    q = F.when(
        F.col("q_scale") == 0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.floor((x - F.col("q_min")) / F.col("q_scale") + 0.5),
        )
    )
    with_q = staged.withColumn("q", q)
    err = F.array_max(
        F.zip_with(
            F.col("_v"),
            F.col("q"),
            lambda x, c: F.abs(x - (F.col("q_min") + c * F.col("q_scale"))),
        )
    )
    return with_q.select(
        id_col,
        "q",
        "q_min",
        "q_scale",
        err.alias("max_abs_err"),
    )


def dequantize(q: Column, q_min: Column, q_scale: Column) -> Column:
    """Reconstruct the float64 vector from codes + params."""
    return F.transform(q, lambda c: q_min + c * q_scale)
