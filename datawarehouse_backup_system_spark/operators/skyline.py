"""Distributed 2-D skyline (Pareto frontier) — minimize x, maximize y.

A point dominates another when it is no worse on both dimensions and
strictly better on at least one. The naive formulation is the quadratic
NOT-EXISTS self-join; the 2-D case collapses to a *prefix-max scan*:
sort by (x asc, y desc) — a point survives iff its y strictly exceeds
the running max-y of everything before it (anything before it has
smaller x, or equal x with larger y; either way max-y ≥ y implies a
dominator). That makes skyline a SORT + running aggregate, not a join.

A single global window would serialize on one task, so the operator
uses the same two-level prefix pattern as ``operators/ids.py`` (F8):

1. bucket points by equi-width ranges of x — rows in a lower bucket
   have strictly smaller x than any row in a higher bucket;
2. per-bucket max-y is a tiny aggregate (``n_buckets`` rows) whose
   EXCLUSIVE prefix max is broadcast back — O(buckets) driver work;
3. within each bucket a window (partitioned by bucket → parallel,
   bounded state) computes the local running max; a point survives iff
   y > greatest(prefix_max_of_lower_buckets, local running max).

Equal (x, y) points tie (neither dominates), so the operator runs on
DISTINCT points carrying multiplicity ``n`` — deterministic output for
hash comparison, duplicates preserved by count.

Shuffle inventory: one groupBy (distinct points), one bucket-local
window — no quadratic join anywhere; survives 100× by construction
(bucket count is the only tuning knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = -(1 << 62)


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, n_buckets: int = 64
) -> DataFrame:
    """Pareto frontier minimizing ``x_col``, maximizing ``y_col`` (both
    integer-typed). Returns distinct surviving points ``(x, y, n)`` with
    their input multiplicity."""
    pts = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lo, hi = pts.agg(F.min("x"), F.max("x")).first()
    if lo is None:
        return pts
    width = max(1, (hi - lo + n_buckets) // n_buckets)
    pts = pts.withColumn(
        "bucket",
        F.least(F.lit(n_buckets - 1), F.expr(f"(x - {lo}) div {width}")),
    )
    # tiny exclusive prefix-max over bucket maxima (O(n_buckets) rows)
    bucket_max = {
        r["bucket"]: r["m"]
        for r in pts.groupBy("bucket").agg(F.max("y").alias("m")).collect()
    }
    prefix: dict[int, int] = {}
    running = _NEG_INF
    for b in range(n_buckets):
        prefix[b] = running
        running = max(running, bucket_max.get(b, _NEG_INF))
    prefix_map = F.create_map(
        *[F.lit(v) for kv in prefix.items() for v in kv]
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("x").asc(), F.col("y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("prev_max", F.greatest(
            F.coalesce(F.max("y").over(w), F.lit(_NEG_INF)),
            prefix_map[F.col("bucket")],
        ))
        .where(F.col("y") > F.col("prev_max"))
        .select("x", "y", "n")
    )
