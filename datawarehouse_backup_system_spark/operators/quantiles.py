"""Mergeable fixed-bin quantile sketch (equi-width histogram CDF).

The 100 TB quantile problem: exact percentiles need a global sort (or
DuckDB-style full materialization), and Spark's ``percentile_approx``
(Greenwald-Khanna) is approximate with an engine-specific answer — not
oracle-checkable across engines. This sketch is the deterministic middle
ground every warehouse ships (equi-width histogram over a known integer
domain): per-shard bin counts, merge = per-bin SUM (associative and
commutative — shard-merge equals the direct build EXACTLY), and the
q-quantile reads the CDF: the lower bound of the first bin whose
cumulative count reaches ``ceil(q·N)``. Error is bounded by one bin
width; the answer is bit-identical regardless of partitioning, row
order, or merge tree shape — which makes it the cross-engine-verifiable
quantile (query h01 pins it against a DuckDB replay of the same integer
arithmetic).

Scale shape: ONE aggregation over the data keyed by ≤ ``n_bins`` bins
(map-side combine does almost all the work; the shuffle moves at most
``partitions × n_bins`` rows), then window/join work on ≤ ``n_bins``
rows. No sort, no collect of data rows.

Reference parity: the reference has no quantile surface at all
(SURVEY.md §2.4 — its aggregates stop at count/max/mode); this is part
of the profiling family a Spark engine adds (with q29's exact
percentiles as the small-data baseline).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_width(lo: int, hi: int, n_bins: int) -> int:
    """ceil((hi - lo + 1) / n_bins) — integer, so binning is exact."""
    if hi < lo:
        raise ValueError("empty domain: hi < lo")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    return (hi - lo + n_bins) // n_bins


def binned_histogram(
    df: DataFrame, value_col: str, lo: int, hi: int, n_bins: int = 64
) -> DataFrame:
    """(bin, cnt) rows — the sketch. ``value_col`` must be integral;
    values outside [lo, hi] clamp into the edge bins (count is never
    silently dropped). NULL values ARE dropped: greatest()/least() skip
    NULL arguments in Spark, so an unfiltered NULL would silently land
    in bin 0 and drag every quantile read toward ``lo``.

    The global sketch IS the grouped sketch with no keys (review r8:
    the clamp/binning expression previously existed twice and a fix in
    one copy could silently miss the other)."""
    return grouped_binned_histogram(df, [], value_col, lo, hi, n_bins)


def merge_histograms(parts: list[DataFrame]) -> DataFrame:
    """Associative merge: union then per-bin SUM. merge(shards) ==
    direct build, exactly, whatever the shard split."""
    if not parts:
        raise ValueError("merge_histograms: no sketches given")
    return (
        reduce(lambda x, y: x.unionByName(y), parts)
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


#: exact integer rank ceil(q·N): q is quantized to micro-units in
#: :func:`_q_frame`, so the read never touches the IEEE product
#: ceil(q_double·N), which rounds up across an integer for ordinary
#: quantiles (review r8: q=0.9, N=10 → ceil(9.000000000000002) = 10 —
#: one full rank high). DECIMAL(38,0) keeps qm·N exact past int64.
_RANK_SQL = "(cast(qm as decimal(38,0)) * n_total + 999999) div 1000000"


def _q_frame(spark, qs: list[float]) -> DataFrame:
    """(q double, qm bigint): the requested quantiles with their exact
    micro-unit quantization (all practical quantiles are exact at 6
    decimals; 0.5/0.9/0.99/... round-trip bit-identically)."""
    rows = [(float(q), int(round(float(q) * 1_000_000))) for q in qs]
    return spark.createDataFrame(rows, "q double, qm bigint")


def histogram_quantiles(
    hist: DataFrame, qs: list[float], lo: int, width: int
) -> DataFrame:
    """(q, value, n_total) per requested quantile: value = lo +
    bin*width (bin lower bound) of the first bin whose cumulative count
    >= ceil(q*N) — the rank in exact integer arithmetic (_RANK_SQL).
    All window/join work is over <= n_bins rows. Delegates to the
    grouped read with no keys (review r8 dedup)."""
    return grouped_histogram_quantiles(hist, [], qs, lo, width)


def grouped_binned_histogram(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int = 64,
) -> DataFrame:
    """(keys..., bin, cnt) — one sketch per group, built in a SINGLE
    aggregation keyed by (keys..., bin): the per-group quantile at 100 TB
    without any per-group sort (contrast q29's exact percentile_approx
    baseline). Shares the sketch's merge/read algebra, including the
    NULL-drop (see binned_histogram)."""
    w = bin_width(lo, hi, n_bins)
    shifted = df.where(F.col(value_col).isNotNull()).select(
        *key_cols, (F.col(value_col) - F.lit(lo)).alias("_shift")
    )
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.expr(f"_shift div {w}")),
    )
    return (
        shifted.withColumn("bin", b.cast("int"))
        .groupBy(*key_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cdf_read(
    hist: DataFrame,
    key_cols: list[str],
    qs: list[float],
    bin_col: str,
    value_alias: str,
    value_expr,
) -> DataFrame:
    """THE CDF-read algebra, shared by every histogram sketch (review
    r10: the cum/n_total windows, q-frame crossJoin, exact-integer rank
    filter and first-crossing groupBy existed twice — the r8
    binned_histogram build-side dedup lesson, applied to the read
    side). ``value_expr`` maps the group's first-crossing bin
    (an aggregate Column over ``bin_col``) to the reported value.
    Bins are unique per group post-build, so the ROWS cumulative frame
    equals the old RANGE default bit-for-bit."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    wk = Window.partitionBy(*key_cols)
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            wk.orderBy(bin_col).rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n_total", F.sum("cnt").over(wk))
    return (
        _q_frame(spark, qs).crossJoin(cum)
        .where(F.col("cum") >= F.expr(_RANK_SQL))
        .groupBy(*key_cols, "q")
        .agg(
            value_expr.alias(value_alias),
            F.min("n_total").alias("n_total"),
        )
    )


def grouped_histogram_quantiles(
    hist: DataFrame,
    key_cols: list[str],
    qs: list[float],
    lo: int,
    width: int,
) -> DataFrame:
    """(keys..., q, value, n_total) — per-group CDF reads. The
    cumulative window is PARTITIONED on the group keys (<= n_bins rows
    per partition), so unlike the global sketch there is no
    single-partition stage at any group count."""
    return _cdf_read(
        hist, key_cols, qs, "bin", "value",
        F.lit(lo) + F.min("bin").cast("bigint") * F.lit(width),
    )


def histograms_equal(a: DataFrame, b: DataFrame) -> DataFrame:
    """One boolean row ``equal`` — full-outer per-bin comparison (a
    plan, not an action; callers fold it into their own output)."""
    j = a.select("bin", F.col("cnt").alias("cnt_a")).join(
        b.select("bin", F.col("cnt").alias("cnt_b")), "bin", "full_outer"
    )
    return j.agg(
        F.coalesce(
            F.min(
                (F.col("cnt_a").isNotNull())
                & (F.col("cnt_b").isNotNull())
                & (F.col("cnt_a") == F.col("cnt_b"))
            ),
            F.lit(True),  # both empty
        ).alias("equal")
    )


def log2_histogram(
    df: DataFrame, key_cols: list[str], col: str
) -> DataFrame:
    """Exponential (log₂-bucketed) histogram — the DDSketch idea at
    γ=2: bucket b holds values in [2^(b-1), 2^b), giving a bounded
    RELATIVE-error quantile sketch in ⌈log₂(max)⌉ buckets, vs the
    equi-width histogram's bounded absolute error. Mergeable like every
    sketch here: (key, bucket) → cnt partials add across shards.

    The bucket index is computed EXACTLY in both engines as the binary
    string length of the integer value (``length(bin(v))`` =
    ⌊log₂ v⌋+1) — never floating ``log2()``, whose rounding at powers
    of two differs across libm builds. Values are clamped to ≥ 1
    (bucket 1); NULLs are DROPPED (greatest(NULL, 1) would otherwise
    silently count them as value 1); integer-typed input required
    (cents).
    """
    v = F.greatest(F.col(col).cast("bigint"), F.lit(1))
    return (
        df.where(F.col(col).isNotNull())
        .select(*key_cols, F.length(F.bin(v)).cast("bigint").alias("bucket"))
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log2_histogram_quantiles(
    hist: DataFrame, key_cols: list[str], qs: list[float]
) -> DataFrame:
    """Per-group quantile estimates from a log₂ histogram: the quantile
    lands in the first bucket whose cumulative count crosses ⌈q·n⌉; the
    reported estimate is that bucket's lower bound 2^(b-1) — within a
    factor of 2 of the true order statistic by construction (the sketch
    guarantee the h04-style audit pins). All integer arithmetic
    (`_cdf_read`; the value map is a bit shift, not pow() — the module
    contract is libm-free integer arithmetic end to end)."""
    return _cdf_read(
        hist, key_cols, qs, "bucket", "est_lo",
        F.expr(
            "shiftleft(cast(1 as bigint), cast(min(bucket) as int) - 1)"
        ),
    )
