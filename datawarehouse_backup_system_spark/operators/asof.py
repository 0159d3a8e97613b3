"""Temporal joins Spark lacks as operators: as-of join and range join.

Generic as-of join: for each left row, the most recent right row at
or before (``backward``) / the earliest at or after (``forward``) its
timestamp, per key.

Spark has no ASOF JOIN operator; the naive emulation is a range
theta-join (quadratic blowup per key) or a join-then-window (two
shuffles + a full candidate materialization). This implementation is the
**union trick**: tag both inputs, union them, and carry the right
payload across the sorted stream with ``last(..., ignorenulls)`` — ONE
shuffle on the key, no join node at all, state per row is a single
struct. The same shape Flink uses for temporal joins and kdb for aj;
scales as a plain window (skewed keys salt like any window).

Tie rule: at equal timestamps the right row sorts BEFORE the left row,
so an exactly-simultaneous right match is taken (inclusive <=/>=,
matching DuckDB's ASOF JOIN, which oracles this operator). Right rows
should be unique per (key, time) — with duplicates, the latest by input
order wins, which is not deterministic; pre-dedup if that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left rows plus the matched right row's payload columns (suffixed)
    and its timestamp as ``{right_ts}{suffix}``; no match → NULLs.

    ``tolerance_seconds`` voids matches farther than the tolerance from
    the left timestamp (pandas ``merge_asof`` semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = [c for c in right.columns if c not in on and c != right_ts]
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in payload]
    clash = set(carried) & set(left.columns)
    if clash:
        raise ValueError(
            f"left columns collide with suffixed right columns: {sorted(clash)}"
            " — pass a different suffix"
        )
    reserved = {"_t", "_src", "_rs", "_m"}
    internal_clash = reserved & (set(left.columns) | set(right.columns))
    if internal_clash:
        raise ValueError(
            f"column names reserved by asof_join: {sorted(internal_clash)}"
        )

    # NULL-timestamp right rows can never be an as-of match (DuckDB ASOF
    # and pandas merge_asof agree: ts <= NULL is no match) — but under
    # the ascending window order they would sort FIRST and their payload
    # would be carried into every otherwise-unmatched left row. Drop them.
    r = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.struct(
            F.col(right_ts).alias(f"{right_ts}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        ).alias("_rs"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != left_ts],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(
            r.schema["_rs"].dataType
        ).alias("_rs"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
    )
    # backward: ascending time, right (src=0) first at ties → last carried
    # right has _t <= left _t, inclusive. forward: descending time, same
    # tie order → last carried right has _t >= left _t.
    order = (
        [F.col("_t").asc(), F.col("_src").asc()]
        if direction == "backward"
        else [F.col("_t").desc(), F.col("_src").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_rs", ignorenulls=True).over(w))
        .where(F.col("_src") == 1)
        # a NULL-timestamp LEFT row has no defined as-of position (it
        # sorts nulls-last under desc order and would pick up the final
        # carried struct) — both reference engines return no match
        .withColumn("_m", F.when(F.col("_t").isNotNull(), F.col("_m")))
    )
    # NULL join keys never match (review r9): Window.partitionBy groups
    # all NULL keys into ONE partition, so a NULL-keyed left row carried
    # a NULL-keyed right row's payload — but both reference engines
    # (DuckDB ASOF JOIN, pandas merge_asof) treat NULL = NULL as no
    # match. The left row still comes through, unmatched.
    key_ok = F.lit(True)
    for k in on:
        key_ok = key_ok & F.col(k).isNotNull()
    matched = matched.withColumn("_m", F.when(key_ok, F.col("_m")))
    if tolerance_seconds is not None:
        us = int(tolerance_seconds * 1_000_000)
        gap = F.unix_micros(F.col("_t")) - F.unix_micros(
            F.col("_m")[f"{right_ts}{suffix}"]
        )
        in_tol = (gap >= -us) & (gap <= us)
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m"))
        )
    return matched.select(
        *[F.col(c) for c in on],
        F.col("_t").alias(left_ts),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        *[F.col("_m")[c].alias(c) for c in carried],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (``start <= ts <= end``, inclusive), per key — without the
    range-theta-join Spark would otherwise plan (a per-key cartesian
    with a post-filter).

    **Bucketing trick**: each interval is exploded to the time buckets
    it covers, each point maps to its single bucket, and the join is an
    EQUI-join on (key, bucket) + an exact containment filter. A point
    matches each qualifying interval exactly once (in the point's own
    bucket), so no dedup pass. Replication factor per interval is
    ``len/bucket_seconds + 1`` — set ``bucket_seconds`` near the typical
    interval length; the equi-join then hash-partitions and AQE handles
    skew, which the theta-join never could.

    Point and interval payload columns must not collide (raises);
    ``on`` + all payload columns of both sides come through.
    """
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    if "_b" in points.columns or "_b" in intervals.columns:
        raise ValueError("column name '_b' is reserved by range_join")
    us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn("_b", F.floor(F.unix_micros(F.col(point_ts)) / us))
    # inverted intervals (end < start) match nothing under the
    # containment filter, but F.sequence with start > stop silently
    # generates a DESCENDING sequence (default step -1) — one malformed
    # interval row could explode into millions of bucket rows before
    # the filter discards them all (review r9). Drop them at the scan.
    intervals = intervals.where(F.col(end_ts) >= F.col(start_ts))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_ts)) / us),
                F.floor(F.unix_micros(F.col(end_ts)) / us),
            )
        ),
    )
    return (
        p.join(i, on + ["_b"])
        .where(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_b")
    )
