"""Per-group isotonic regression (PAVA) via ``applyInPandas`` —
probability calibration for classifier scores.

The one operator family in this repo that genuinely needs the
grouped-map escape hatch: pool-adjacent-violators is inherently
SEQUENTIAL within a group (each pooling decision depends on every prior
one), so no composition of joins/windows/aggregates expresses it. The
groups themselves are tiny (score buckets — tens of rows), so the right
distributed shape is: shuffle once on the group key, run the exact
sequential algorithm per group inside an Arrow batch, emit the fitted
curve. This is precisely what ``applyInPandas`` is for; the data-sized
work (bucketing + counting) happens BEFORE it in plain aggregations.

Correctness is cross-checked through a classical theorem rather than a
reimplementation: weighted L2 isotonic regression satisfies the minimax
formula  iso(i) = max_{a<=i} min_{b>=i} weighted-mean(y[a..b]), so the
DuckDB oracle replays the O(n³)-per-group minimax (fine for n=buckets)
and must agree with PAVA bucket-for-bucket. All pooling arithmetic is
exact integer (sum, count) pairs compared by cross-multiplication; the
reported rate is floor(1e6·sum/count) — engine-exact micro-units.

Public-algorithm lineage: PAVA (Ayer et al. 1955); calibration use as
in Zadrozny & Elkan's calibration literature; sklearn's
IsotonicRegression is the reference semantics (L2, weighted).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pava_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact weighted PAVA over one group, ordered by bucket.

    Input columns: bucket, y_sum, n (integers). Output adds
    ``rate_micro`` = floor(1e6 * pooled_sum / pooled_n) — the isotonic
    (non-decreasing) calibrated rate per bucket.
    """
    pdf = pdf.sort_values("bucket").reset_index(drop=True)
    # stack of blocks [start_idx, S, C]; merge while the tail violates
    blocks: list[list[int]] = []
    for idx, row in enumerate(pdf.itertuples(index=False)):
        s, c = int(row.y_sum), int(row.n)
        if c == 0 and s != 0:
            raise ValueError(
                f"isotonic bucket {row.bucket} has y_sum={s} with n=0"
            )
        if c == 0 and blocks:
            # a zero-WEIGHT bucket carries no constraint of its own
            # (sklearn drops zero-weight samples); folding it into the
            # current pool keeps the output non-decreasing — a separate
            # (0,0) block never merges (0 > 0 is false both ways) and
            # reported rate 0, breaking the isotonic guarantee
            # (review r8)
            continue
        blocks.append([idx, s, c])
        # a zero-weight LEADING block is absorbed by the first real one
        # (it kept idx 0 so the bounds still cover its rows)
        while len(blocks) >= 2 and blocks[-2][2] == 0:
            start0, s0, _c0 = blocks[-2]
            blocks[-1][0] = start0
            blocks[-1][1] += s0
            del blocks[-2]
        # violation: prev_mean > cur_mean  <=>  S1*C2 > S2*C1 (exact)
        while (
            len(blocks) >= 2
            and blocks[-2][1] * blocks[-1][2]
            > blocks[-1][1] * blocks[-2][2]
        ):
            _, s2, c2 = blocks.pop()
            blocks[-1][1] += s2
            blocks[-1][2] += c2
    rate = [0] * len(pdf)
    bounds = [b[0] for b in blocks] + [len(pdf)]
    for k, (start, s, c) in enumerate(blocks):
        micro = (1_000_000 * s) // c if c else 0
        for i in range(start, bounds[k + 1]):
            rate[i] = micro
    out = pdf.copy()
    out["rate_micro"] = pd.Series(rate, dtype="int64")
    return out


def isotonic_calibrate(
    df: DataFrame, group_cols: list[str]
) -> DataFrame:
    """df columns: group_cols..., bucket (int), y_sum (long), n (long)
    → same rows plus ``rate_micro``, non-decreasing in bucket within
    each group. One shuffle on the group key; per-group work is the
    exact sequential PAVA inside the Arrow batch."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", rate_micro long"
    # applyInPandas feeds one GROUP per function call (keyed by
    # group_cols); mapInPandas would hand arbitrary row batches and
    # break the per-group sequential invariant
    return df.groupBy(*group_cols).applyInPandas(_pava_rows, schema=schema)


def conformal_threshold(
    scores: DataFrame,
    group_cols: list[str],
    score_col: str,
    cal_flag_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal prediction threshold per group, exact-integer.

    Classical split conformal (Vovk et al.; Lei et al. 2018): on a held
    -out calibration split, the (1-α) upper prediction bound is the
    k-th smallest nonconformity score with  k = ⌈(n_cal+1)·(1-α)⌉ —
    a pure ORDER STATISTIC, so the whole operator is one window rank
    per group plus counting, no floating point anywhere: k is computed
    with integer ceiling division from the rational α = alpha_num/
    alpha_den, and the reported empirical coverage on the evaluation
    split is floor(1e6·n_covered/n_eval) micro-units.

    Distributed shape: one shuffle on ``group_cols`` for the rank
    window (calibration rows only — the small split), one broadcast-
    joinable per-group threshold row, one aggregation over the eval
    split. Scores must be integer-typed (cents).

    Returns per group: ``n_cal, k_rank, q_hat, saturated, n_eval,
    n_covered, coverage_ppm``. ``saturated`` is true when the unclamped
    rank ⌈(n_cal+1)·(1-α)⌉ exceeds n_cal — classical split conformal
    returns +∞ there (no finite bound can deliver (1-α) coverage from
    so few calibration points; the guarantee degrades to
    n_cal/(n_cal+1)); the clamped max-score q_hat is still emitted, but
    callers must not treat a saturated bound as a valid (1-α) bound
    (review r8).
    """
    from pyspark.sql import Window

    cal = scores.where(F.col(cal_flag_col))
    ev = scores.where(~F.col(cal_flag_col))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).asc(), F.monotonically_increasing_id()
    )
    ranked = cal.withColumn("rk", F.row_number().over(w).cast("bigint"))
    n_cal = cal.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_cal"))
    # k = ceil((n_cal+1) * (den-num) / den), clamped into [1, n_cal]
    num = alpha_den - alpha_num
    k_raw = F.expr(
        f"(((n_cal + 1) * {num}) + {alpha_den} - 1) div {alpha_den}"
    )
    k = n_cal.withColumn(
        "k_rank",
        F.greatest(
            # the lower clamp was missing (review r8): α=1 gives k=0,
            # which matches NO rank row and silently dropped the group
            F.lit(1).cast("bigint"),
            F.least(F.col("n_cal"), k_raw),
        ),
    ).withColumn("saturated", k_raw > F.col("n_cal"))
    thresh = (
        ranked.join(k, group_cols)
        .where(F.col("rk") == F.col("k_rank"))
        .select(*group_cols, "n_cal", "k_rank", "saturated",
                F.col(score_col).alias("q_hat"))
    )
    cov = ev.join(F.broadcast(thresh), group_cols).groupBy(
        *group_cols, "n_cal", "k_rank", "saturated", "q_hat"
    ).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum((F.col(score_col) <= F.col("q_hat")).cast("bigint")).alias(
            "n_covered"
        ),
    )
    return cov.withColumn(
        "coverage_ppm", F.expr("(n_covered * 1000000) div n_eval")
    )
