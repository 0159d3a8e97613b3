"""Link-analysis over edge lists: fixed-iteration weighted PageRank.

Why in a corpus engine: link-graph centrality is a standard web-corpus
quality prior (Common-Crawl-derived pipelines rank hosts by harmonic /
PageRank centrality to pick crawl frontiers and filter link farms).
The same primitive ranks any transition graph — e.g. event-type flow
graphs from product analytics.

Scale shape: each iteration is ONE equi-join of the current rank vector
against the (src-partitioned) edge list plus a groupBy(dst) sum — the
alternating join/agg shape GraphX's Pregel uses. The rank vector is
persisted per round and the previous round unpersisted, so lineage stays
shallow; the edge list is the big side and is never re-shuffled when
pre-partitioned by src (one-time repartition, reused every round).
A FIXED iteration count keeps the result deterministic and
oracle-replayable (unrolled SQL); convergence-based stopping would need
a driver-side residual check per round (same shape as
dedup_approx.dedup_groups) and is intentionally not the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    round_digits: int = 6,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    rank₀(v) = 1/N;
    rankₜ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} rankₜ(u)·w(u,v)/W(u)

    where W(u) is u's total out-weight. Dangling mass (nodes with no
    out-edges) is dropped, the common simplification — documented, and
    irrelevant for transition graphs where every observed state has an
    outgoing edge. Nodes = src ∪ dst. Output: (node, rank) with rank
    rounded to ``round_digits`` at the END only (intermediate ranks stay
    full-precision; per-node sums are small, so cross-engine FP drift is
    far below the rounding grain).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
    )
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    # normalized edge transition probabilities, computed once and reused
    # every iteration (at scale: repartition by _src once, persist)
    # NOT persisted: the returned plan must not leak pinned executor
    # memory to callers who never get a handle to unpersist (the result
    # is lazy). With a fixed small iteration count the recompute cost is
    # bounded; a convergence-driven production loop would persist norm_e
    # and the per-round rank vector and unpersist round-over-round, the
    # pattern dedup_approx.dedup_groups implements.
    norm_e = e.join(out_w, "_src").select(
        "_src", "_dst", (F.col("_w") / F.col("_out_w")).alias("_p")
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            norm_e.join(
                ranks.select(F.col("node").alias("_src"), "rank"), "_src"
            )
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select(
        "node", F.round(F.col("rank"), round_digits).alias("rank")
    )
