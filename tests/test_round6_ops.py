"""Round-6 operator tests: incremental view maintenance, skyline,
dyadic EWMA, conformal thresholds, log2 histograms. (The bloom file
index is covered in test_scale_ext.py next to the stats manifest.)"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_backup_system_spark.operators.behavior import (  # noqa: E402
    ewma_dyadic,
)
from datawarehouse_backup_system_spark.operators.calibration import (  # noqa: E402
    conformal_threshold,
)
from datawarehouse_backup_system_spark.operators.incremental import (  # noqa: E402
    finalize,
    merge_partials,
    partial_aggs,
)
from datawarehouse_backup_system_spark.operators import quantiles as qsk  # noqa: E402
from datawarehouse_backup_system_spark.operators.skyline import (  # noqa: E402
    skyline_2d,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------- incremental
def test_incremental_merge_equals_full_recompute(spark):
    """view ⊕ partial(batch) == partial(history ∪ batch), any split."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 13 % 101).alias("v")
    )
    for split in (0, 300, 1000):
        hist = df.where(F.col("id") < split) if split else df.limit(0)
        batch = df.where(F.col("id") >= split)
        merged = merge_partials(
            partial_aggs(hist, ["g"], "v"),
            partial_aggs(batch, ["g"], "v"), ["g"],
        )
        direct = partial_aggs(df, ["g"], "v")
        cols = ("g", "n_rows", "sum_v", "min_v", "max_v")
        assert _rows(merged, *cols) == _rows(direct, *cols)


def test_incremental_merge_is_associative(spark):
    """Three batches folded left or right give the same view."""
    df = spark.range(0, 300).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    parts = [
        partial_aggs(df.where((F.col("id") % 3) == i), ["g"], "v")
        for i in range(3)
    ]
    left = merge_partials(merge_partials(parts[0], parts[1], ["g"]),
                          parts[2], ["g"])
    right = merge_partials(parts[0],
                           merge_partials(parts[1], parts[2], ["g"]), ["g"])
    cols = ("g", "n_rows", "sum_v", "min_v", "max_v")
    assert _rows(left, *cols) == _rows(right, *cols)
    fin = finalize(left)
    r = {x[0]: x for x in _rows(fin, "g", "sum_v", "n_rows", "avg_floor")}
    for g, s, n, a in r.values():
        assert a == s // n


# -------------------------------------------------------------------- skyline
def _naive_skyline(points):
    pts = sorted(set(points))
    out = []
    for x, y in pts:
        dominated = any(
            (qx <= x and qy >= y and (qx < x or qy > y)) for qx, qy in pts
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_matches_naive_dominance(spark):
    import random

    rng = random.Random(42)
    points = [(rng.randrange(0, 50), rng.randrange(0, 50))
              for _ in range(400)]
    df = spark.createDataFrame(points, "x bigint, y bigint")
    got = _rows(skyline_2d(df, "x", "y", n_buckets=8), "x", "y")
    assert got == _naive_skyline(points)


def test_skyline_keeps_tied_points_with_multiplicity(spark):
    df = spark.createDataFrame(
        [(1, 5), (1, 5), (2, 9), (2, 4), (3, 9)], "x bigint, y bigint"
    )
    # (1,5) survives with n=2; (2,9) beats (2,4) and dominates (3,9)
    got = _rows(skyline_2d(df, "x", "y", n_buckets=4), "x", "y", "n")
    assert got == [(1, 5, 2), (2, 9, 1)]


def test_skyline_drops_null_coordinates(spark):
    """A NULL coordinate has no dominance position: the row is dropped
    up front instead of landing in an arbitrary bucket and poisoning
    the running max for real points (review r8)."""
    df = spark.createDataFrame(
        [(None, 1000), (0, 1), (6300, 500), (5, None)],
        "x bigint, y bigint",
    )
    got = _rows(skyline_2d(df, "x", "y", n_buckets=64), "x", "y", "n")
    # without the filter, (None,1000)'s max-y would shadow (6300,500)
    assert got == [(0, 1, 1), (6300, 500, 1)]


def test_skyline_partitioning_invariant(spark):
    df = spark.range(0, 500).select(
        (F.xxhash64("id") % 100).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 100).alias("y"),
    )
    a = _rows(skyline_2d(df.repartition(1), "x", "y"), "x", "y", "n")
    b = _rows(skyline_2d(df.repartition(17), "x", "y"), "x", "y", "n")
    assert a == b and len(a) > 0


# ----------------------------------------------------------------------- ewma
def test_ewma_matches_sequential_reference(spark):
    """Window-lag EWMA == per-key sequential computation of the same
    truncated dyadic sum."""
    import random

    rng = random.Random(7)
    rows = [(i % 5, i, rng.randrange(0, 10_000)) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, t bigint, c bigint")
    got = {
        r["k"]: (r["m_terms"], r["ewma_num"], r["ewma_den"], r["ewma_milli"])
        for r in ewma_dyadic(df, "k", ["t"], "c", k_window=16).collect()
    }
    by_key: dict[int, list[int]] = {}
    for k, t, c in sorted(rows, key=lambda r: r[1]):
        by_key.setdefault(k, []).append(c)
    for k, vals in by_key.items():
        last = vals[-16:]
        m = len(last)
        num = sum(c * (1 << (15 - j)) for j, c in enumerate(reversed(last)))
        den = (1 << 16) - (1 << (16 - m))
        assert got[k] == (m, num, den, num * 1000 // den)


def test_ewma_short_history(spark):
    df = spark.createDataFrame([(1, 1, 100), (1, 2, 200)],
                               "k bigint, t bigint, c bigint")
    (row,) = ewma_dyadic(df, "k", ["t"], "c").collect()
    # newest=200 weight 2^15, prev=100 weight 2^14; den = 2^16 - 2^14
    num = 200 * (1 << 15) + 100 * (1 << 14)
    den = (1 << 16) - (1 << 14)
    assert (row["m_terms"], row["ewma_num"], row["ewma_den"]) == (2, num, den)
    assert row["ewma_milli"] == num * 1000 // den


# ------------------------------------------------------------------ conformal
def test_conformal_rank_and_coverage(spark):
    """q_hat is the exact k-th calibration order statistic and the
    marginal coverage on exchangeable data lands near 1-α."""
    df = spark.range(0, 2000).select(
        F.lit("g").alias("grp"),
        (F.xxhash64("id") % 100_000).alias("score"),
        (F.col("id") % 2 == 0).alias("is_cal"),
    )
    (row,) = conformal_threshold(
        df, ["grp"], "score", "is_cal", alpha_num=1, alpha_den=10
    ).collect()
    cal = sorted(
        r["score"] for r in df.where("is_cal").select("score").collect()
    )
    n = len(cal)
    k = min(n, -(-((n + 1) * 9) // 10))
    assert row["n_cal"] == n and row["k_rank"] == k
    assert row["q_hat"] == cal[k - 1]
    assert 850_000 <= row["coverage_ppm"] <= 950_000  # ~90% nominal


def test_conformal_alpha_one_clamps_k_to_one(spark):
    """Review r8: α=1 made k_rank=0 (no rank row matches) and the
    group silently VANISHED from the output; the documented lower
    clamp k>=1 must hold."""
    df = spark.range(0, 100).select(
        F.lit("g").alias("grp"),
        F.col("id").alias("score"),
        (F.col("id") % 2 == 0).alias("is_cal"),
    )
    (row,) = conformal_threshold(
        df, ["grp"], "score", "is_cal", alpha_num=1, alpha_den=1
    ).collect()
    assert row["k_rank"] == 1
    assert row["q_hat"] == 0  # the smallest calibration score


def test_isotonic_zero_weight_bucket_stays_monotone(spark):
    """Review r8: an (y_sum=0, n=0) bucket never pooled (0>0 is false
    both ways) and reported rate 0, breaking the non-decreasing
    guarantee; it must inherit its pool's rate — leading, middle, and
    trailing positions."""
    from datawarehouse_backup_system_spark.operators.calibration import (
        isotonic_calibrate,
    )

    rows = [
        ("g", 0, 0, 0),    # leading empty
        ("g", 1, 5, 10),
        ("g", 2, 0, 0),    # middle empty
        ("g", 3, 9, 10),
        ("g", 4, 0, 0),    # trailing empty
    ]
    df = spark.createDataFrame(
        rows, "grp string, bucket int, y_sum long, n long"
    )
    got = {
        r["bucket"]: r["rate_micro"]
        for r in isotonic_calibrate(df, ["grp"]).collect()
    }
    rates = [got[b] for b in sorted(got)]
    assert rates == sorted(rates)          # isotonic restored
    assert got[0] == got[1] == 500_000     # leading inherits first pool
    assert got[2] == 500_000               # middle inherits its pool
    assert got[3] == got[4] == 900_000     # trailing inherits last pool

    # malformed: evidence without weight is loudly rejected
    import pytest as _pytest

    bad = spark.createDataFrame(
        [("g", 0, 3, 0)], "grp string, bucket int, y_sum long, n long"
    )
    with _pytest.raises(Exception, match="n=0"):
        isotonic_calibrate(bad, ["grp"]).collect()


# -------------------------------------------------------------- log2 histogram
def test_log2_histogram_buckets_and_merge(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 7, 8, 1000]], "g string, v bigint"
    )
    hist = qsk.log2_histogram(df, ["g"], "v")
    got = {(r["bucket"]): r["cnt"] for r in hist.collect()}
    # 1→b1; 2,3→b2; 4,7→b3; 8→b4; 1000→b10
    assert got == {1: 1, 2: 2, 3: 2, 4: 1, 10: 1}
    # mergeable: two half-builds sum to the direct build
    h1 = qsk.log2_histogram(df.where("v <= 4"), ["g"], "v")
    h2 = qsk.log2_histogram(df.where("v > 4"), ["g"], "v")
    merged = h1.unionByName(h2).groupBy("g", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    assert _rows(merged, "g", "bucket", "cnt") == _rows(
        hist, "g", "bucket", "cnt"
    )


def test_log2_quantile_within_factor_two(spark):
    import random

    rng = random.Random(3)
    vals = [rng.randrange(1, 1_000_000) for _ in range(5000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v bigint")
    hist = qsk.log2_histogram(df, ["g"], "v")
    out = {
        r["q"]: r["est_lo"]
        for r in qsk.log2_histogram_quantiles(hist, ["g"], [0.5, 0.99])
        .collect()
    }
    s = sorted(vals)
    for q, est in out.items():
        true = s[-(-int(q * len(s)) // 1) - 1]
        assert est <= true < 2 * est  # the sketch's relative-error bound


# ------------------------------------------------------------------ bottom-k
def test_bottomk_merge_and_union_semantics(spark):
    """bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) and the
    sample is identical under any partitioning / retry."""
    from datawarehouse_backup_system_spark.operators.sampling import (
        bottomk_sample,
    )

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    a = df.where("k < 1200")
    b = df.where("k >= 1200")
    direct = _rows(bottomk_sample(df, ["g"], "k", 7), "g", "k",
                   "rank_in_group")
    merged = _rows(
        bottomk_sample(
            bottomk_sample(a, ["g"], "k", 7)
            .select("g", "k")
            .unionByName(bottomk_sample(b, ["g"], "k", 7).select("g", "k")),
            ["g"], "k", 7,
        ),
        "g", "k", "rank_in_group",
    )
    assert direct == merged
    repart = _rows(
        bottomk_sample(df.repartition(13), ["g"], "k", 7),
        "g", "k", "rank_in_group",
    )
    assert direct == repart and len(direct) == 21


# ---------------------------------------------------------------------------
# KMV bottom-k distinct sketches (w04 operator)
# ---------------------------------------------------------------------------
def test_kmv_sketch_merge_law(spark):
    """Sketch of a union == k smallest of the union of shard sketches —
    the mergeability that makes KMV a 100 TB primitive (each shard
    ships k rows, the combiner re-takes k)."""
    from datawarehouse_backup_system_spark.operators.sketches import (
        kmv_sketch,
    )

    k = 8
    rows = [("g", f"user{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, uid string")
    shard1 = df.where(F.length("uid") % 2 == 0)
    shard2 = df.where(F.length("uid") % 2 == 1)
    full = {r["h"] for r in kmv_sketch(df, "g", "uid", k).collect()}
    merged = (
        kmv_sketch(shard1, "g", "uid", k)
        .unionByName(kmv_sketch(shard2, "g", "uid", k))
        .select("g", "h").distinct()
        .orderBy("h").limit(k)
    )
    assert {r["h"] for r in merged.collect()} == full


def test_kmv_overlap_unsaturated_is_exact(spark):
    """Below k distinct keys, the kept set IS the union: est_union and
    est_inter equal the exact cardinalities."""
    from datawarehouse_backup_system_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    rows = [("a", f"u{i}") for i in range(10)] + [
        ("b", f"u{i}") for i in range(6, 14)
    ]
    df = spark.createDataFrame(rows, "t string, uid string")
    out = kmv_pair_overlap(kmv_sketch(df, "t", "uid", 64), 64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert r["est_union"] == 14          # |{u0..u13}|
    assert r["n_common"] == 4 and r["est_inter"] == 4   # {u6..u9}


def test_kmv_overlap_saturated_estimate_close(spark):
    """Saturated regime: k=64 sketches over 2000/1000-element sets with
    a known 500-element intersection estimate within ~40% relative
    error (KMV rse ≈ 1/sqrt(k-1) ≈ 12.6%; 3 sigma)."""
    from datawarehouse_backup_system_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    rows = [("a", f"user{i}") for i in range(2000)] + [
        ("b", f"user{i}") for i in range(1500, 2500)
    ]
    df = spark.createDataFrame(rows, "t string, uid string")
    r = kmv_pair_overlap(kmv_sketch(df, "t", "uid", 64), 64).collect()[0]
    assert abs(r["est_union"] - 2500) / 2500 < 0.4
    assert abs(r["est_inter"] - 500) / 500 < 0.6


# ---------------------------------------------------------------------------
# incremental join-view maintenance (u07 operator)
# ---------------------------------------------------------------------------
def test_merge_join_view_equals_full_recompute(spark):
    from datawarehouse_backup_system_spark.operators.incremental import (
        merge_join_view,
    )

    a = spark.createDataFrame(
        [(i, i % 7, i * 10) for i in range(300)], "oid long, k long, v long"
    )
    b = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(9)], "k long, name string"
    )
    a_hist, a_new = a.where("oid < 200"), a.where("oid >= 200")
    b_hist, b_new = b.where("k % 3 != 0"), b.where("k % 3 = 0")
    view = a_hist.join(b_hist, ["k"])
    got = merge_join_view(view, a_hist, a_new, b_hist, b_new, ["k"])
    want = a.join(b, ["k"])
    cols = ["oid", "k", "v", "name"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    # a key that exists ONLY in the delta dim still joins new facts
    assert got.where("k = 0").count() == a.where("k % 7 = 0").count()


def test_merge_join_view_empty_deltas_is_identity(spark):
    from datawarehouse_backup_system_spark.operators.incremental import (
        merge_join_view,
    )

    a = spark.createDataFrame([(1, 1, 5)], "oid long, k long, v long")
    b = spark.createDataFrame([(1, "x")], "k long, name string")
    empty_a, empty_b = a.where("oid < 0"), b.where("k < 0")
    view = a.join(b, ["k"])
    got = merge_join_view(view, a, empty_a, b, empty_b, ["k"])
    assert got.count() == view.count() == 1


def test_ewma_null_values_dropped_and_den_guarded(spark):
    """ADVICE r6: the den = 2^k - 2^(k-m) correction is exact only when
    the missing terms are the OLDEST lags — interior NULL values are now
    dropped up front (restoring that shape) and an empty window can
    never divide by zero."""
    df = spark.createDataFrame(
        [("k", 1, 10), ("k", 2, None), ("k", 3, 30)],
        "k string, t int, c int",
    )
    (row,) = ewma_dyadic(df, "k", ["t"], "c", k_window=16).collect()
    # surviving sequence [10, 30]: newest weight 2^15, m=2
    num = 30 * (1 << 15) + 10 * (1 << 14)
    den = (1 << 16) - (1 << 14)
    assert (row["m_terms"], row["ewma_num"], row["ewma_den"]) == (2, num, den)
    assert row["ewma_milli"] == num * 1000 // den
    # an all-NULL key yields no row at all (not a den=0 crash)
    df2 = spark.createDataFrame([("z", 1, None)], "k string, t int, c int")
    assert ewma_dyadic(df2, "k", ["t"], "c").collect() == []
