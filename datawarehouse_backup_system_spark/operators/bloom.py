"""Bloom-filter runtime pre-filtering for selective joins.

Spark's own runtime row-level filtering (InjectRuntimeFilter) builds a
bloom over the selective build side and pushes a ``might_contain``
probe below the probe side's shuffle — but it only fires when the
optimizer's heuristics line up, and its ``bloom_filter_agg`` aggregate
is not exposed as a public function in this build. This module makes
the same pattern explicit and composable:

1. **build**: one hash aggregation over the dim keys — each key sets
   ``n_hashes`` bit positions; positions fold into 64-bit words via
   ``bit_or`` grouped by word index. The result is at most
   ``n_bits/64`` rows, collected to the driver (a 64 K-bit filter is
   1 KiB of longs — bounded by construction, independent of dim
   cardinality).
2. **probe**: the word array is embedded as a LITERAL array column, so
   the membership test is pure expression math inside the fact scan's
   projection — no join, no shuffle, evaluated before the expensive
   exchange, exactly where a runtime filter belongs. At 100 TB this is
   the difference between shuffling every fact row and shuffling only
   the ~selectivity fraction that can possibly match.
3. **verify**: blooms admit false positives, so ``bloom_semi_join``
   finishes with a real semi-join on the survivors — the RESULT is
   exact; the bloom only sheds shuffle volume.

The bit positions use ``xxhash64`` with per-probe salts: engine
parity is NOT required here because the bloom never affects the final
result, only the intermediate volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shiftleft(base: Column, bits: Column) -> Column:
    # the python wrapper F.shiftleft only takes a literal int for bits;
    # the underlying SQL function accepts any expression
    return F.call_function("shiftleft", base, bits)


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    # canonicalize to STRING before hashing (review r9): xxhash64 is
    # PHYSICAL-type-sensitive — an INT fact key and a BIGINT dim key
    # holding the same value hash to different bit positions, so the
    # probe missed rows the closing semi-join (which type-coerces)
    # would have matched, silently dropping them from the 'exact'
    # result. String canonicalization makes every integer-family pair
    # agree (the table_format manifest blooms use the same rule,
    # table_format.py:1086). Caveat: a fractional-vs-integer pair
    # ('42.0' vs '42') still disagrees — keep fact/dim key types in
    # the same family, as any sane schema does.
    return [
        F.pmod(
            F.xxhash64(F.lit(f"bloom{i}"), key.cast("string")),
            F.lit(n_bits),
        )
        for i in range(n_hashes)
    ]


def build_bloom_words(
    df: DataFrame, key_col: str, n_bits: int = 1 << 16, n_hashes: int = 5
) -> list[int]:
    """Aggregate the dim keys into a dense list of ``n_bits/64`` words.

    One explode (×n_hashes) + one hash agg on word index; the collect
    is bounded by the filter size, never by ``df``'s row count.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes)))
    words = (
        df.select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("int").alias("_w"),
            _shiftleft(F.lit(1).cast("bigint"), (F.col("_pos") % 64).cast("int")).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_word"))
        .collect()
    )
    dense = [0] * (n_bits // 64)
    for r in words:
        dense[r["_w"]] = r["_word"]
    return dense


def might_contain(
    key: Column, words: list[int], n_bits: int, n_hashes: int = 5
) -> Column:
    """Expression-level bloom membership test against literal words."""
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    cond: Column | None = None
    for pos in _positions(key, n_bits, n_hashes):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        mask = _shiftleft(F.lit(1).cast("bigint"), (pos % 64).cast("int"))
        bit = word.bitwiseAND(mask) != 0
        cond = bit if cond is None else cond & bit
    assert cond is not None
    return cond


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact semi-join with a bloom pre-filter on the fact side.

    Result-identical to ``fact SEMI JOIN dim`` — the bloom only sheds
    non-matching fact rows before the join's exchange. Use when the dim
    side is selective but too large / too late-bound for a static ``IN``
    list.
    """
    words = build_bloom_words(dim, dim_key, n_bits, n_hashes)
    pre = fact.where(might_contain(F.col(fact_key), words, n_bits, n_hashes))
    return pre.join(
        dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates([fact_key]),
        fact_key,
        "left_semi",
    )
