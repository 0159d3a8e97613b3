"""Linear quality classifier: expression-only inference + distributed
batch-gradient training.

Web-corpus pipelines gate documents with a tiny linear model over
handcrafted features (the public fastText-style quality filters used by
CCNet / GPT-3 / LLaMA data work). Both halves stay Spark-native:

- **Inference** is a single codegen'd expression — a dot product of
  literal weights against feature columns plus a sigmoid. Zero shuffles,
  zero UDFs; at 100 TB it rides along whatever scan already reads the
  features, and the same arithmetic replays in DuckDB for oracle parity.
- **Training** is full-batch gradient descent where each iteration is ONE
  distributed aggregation: the gradient Σ (σ(wᵀx) − y)·x is a sum of
  per-row vectors, computed map-side-combined by a single ``agg`` of
  k+1 sums; only the (k+1)-float gradient reaches the driver. Same
  driver-sync-per-iteration shape as Lloyd k-means (operators/kmeans
  lineage) and MLlib's own LBFGS loop — the collected state is O(k),
  never O(rows).

No reference-repo counterpart (net-new curation capability).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lr_score(features: dict[str, float], bias: float = 0.0) -> Column:
    """σ(b + Σ wᵢ·colᵢ) as a pure column expression.

    ``features`` maps column name → literal weight. Missing/null feature
    values are treated as 0 so a sparse row scores rather than nulling
    out the whole document.
    """
    z = F.lit(float(bias))
    for col, w in features.items():
        # try_cast: ANSI-safe — malformed values score as 0, never throw
        z = z + F.lit(float(w)) * F.coalesce(
            F.col(col).try_cast("double"), F.lit(0.0)
        )
    return sigmoid(z)


def train_lr(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 50,
    l2: float = 0.0,
) -> tuple[dict[str, float], float]:
    """Full-batch logistic regression via distributed gradient descent.

    Feature standardization is the caller's job (raw count features need
    it for a plain GD step size to behave). Each iteration runs one
    narrow aggregation over the persisted feature projection; the
    per-iteration driver payload is k+1 doubles.

    Returns ``(weights_by_col, bias)`` — plain floats, ready to feed
    :func:`lr_score` as literals (and to embed in oracle SQL).
    """
    # try_cast (not cast): under ANSI mode a malformed value would throw
    # mid-aggregation; try_cast yields NULL, which the label validation
    # below turns into a clear error and feature coalesce turns into 0
    cols = [
        F.coalesce(F.col(c).try_cast("double"), F.lit(0.0)).alias(c)
        for c in feature_cols
    ]
    data = df.select(
        *cols, F.col(label_col).try_cast("double").alias("_y")
    ).persist()
    try:
        stats = data.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("_y").alias("n_labeled"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        ).collect()[0]
        n = stats["n"]  # also materializes the persist
        if n == 0:
            raise ValueError("train_lr: empty training frame")
        if stats["n_labeled"] < n:
            # silently-dropped labels would vanish from the gradient sums
            # while still inflating n, attenuating every step — refuse
            raise ValueError(
                f"train_lr: {n - stats['n_labeled']} of {n} labels are "
                f"NULL or not castable to double ('{label_col}') — clean "
                "or filter the label column first"
            )
        if stats["y_min"] < 0.0 or stats["y_max"] > 1.0:
            # {-1,+1} (SVM coding) or {1,2} (1-based classes) would
            # train a garbage model SILENTLY: for y=-1 the residual
            # sigmoid(z)-y never vanishes and weights march for all
            # iterations (review r10). Same refuse-loudly philosophy as
            # the NULL-label check; soft labels in [0, 1] stay legal.
            raise ValueError(
                f"train_lr: labels must lie in [0, 1] (got range "
                f"[{stats['y_min']}, {stats['y_max']}] in "
                f"'{label_col}') — recode {{-1,+1}}/{{1,2}} labels to "
                "{0,1} first"
            )
        w = [0.0] * len(feature_cols)
        b = 0.0
        for _ in range(iters):
            z = F.lit(b)
            for wi, c in zip(w, feature_cols):
                z = z + F.lit(wi) * F.col(c)
            err = sigmoid(z) - F.col("_y")
            grad_row = data.agg(
                *[F.sum(err * F.col(c)).alias(f"g{i}") for i, c in enumerate(feature_cols)],
                F.sum(err).alias("gb"),
            ).collect()[0]
            w = [
                wi - lr * (grad_row[f"g{i}"] / n + l2 * wi)
                for i, wi in enumerate(w)
            ]
            b -= lr * grad_row["gb"] / n
        if any(not math.isfinite(x) for x in (*w, b)):
            raise ArithmeticError(
                "train_lr diverged (non-finite weights) — lower lr or "
                "standardize features"
            )
        return dict(zip(feature_cols, w)), b
    finally:
        data.unpersist()
