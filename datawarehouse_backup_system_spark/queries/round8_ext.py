"""Round-8 extension specs: connected components at scale.

The graph family had one primitive (PageRank); this adds weakly-
connected components via the large-star/small-star algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond" — public
literature), `operators/graph.py:connected_components`. Unlike the
min-label propagation already shipped for near-dup groups (d09), the
star algorithm converges in O(log n) rounds on ANY graph — including
the long chains event-succession graphs produce, where label
propagation needs O(chain length) shuffles.

The spec runs it on exactly such a graph: per-user event-succession
edges (consecutive events ≤ 12 h apart), whose components ARE the
user's sessions. The DuckDB oracle recomputes the same partition with
a completely different algorithm — window-function sessionization
(lag-gap break flags + a running sum) — so an EXACT match machine-
checks the component structure, not a replay of the same plan.

Reference analog: none (the daemon has no graph analytics); extends
§2.6 the way the funnel/path/PageRank operators do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import connected_components, triangle_counts
from .base import QuerySpec, load

#: session gap: consecutive same-user events at most 12 h apart are
#: linked. Compared in exact integer MICROSECONDS on both engines —
#: second-truncation could flip a boundary edge between engines.
_G03_GAP_US = 43_200 * 1_000_000
#: canonical alias: round9's g05/h0x share THIS gap and THIS edge build
SESSION_GAP_US = _G03_GAP_US


def session_edges(
    spark: SparkSession, sf_dir: str, max_lag: int
) -> DataFrame:
    """(src, dst) raw succession edges with lags 1..``max_lag`` inside
    the 12 h session gap — THE single edge builder for the session
    graph family (review r11: g03/g04/g05 carried four hand-copied
    Spark twins of the same gap/edge recipe; a gap or tie-break change
    in one silently desynced the others from their shared-graph
    docstrings). ONE user-window pass and ONE explode over it (a
    per-lag self-union would re-evaluate the window subtree per branch
    on top of the shared exchange — SCALE.md measured lesson)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    cols = [F.col("event_id").alias("_id"), us.alias("_us")]
    lags = range(1, max_lag + 1)
    for j in lags:
        cols += [
            F.lag("event_id", j).over(w).alias(f"_p{j}"),
            F.lag(us, j).over(w).alias(f"_p{j}us"),
        ]
    succ = ev.select(*cols)
    cand = F.array(*[
        F.struct(
            F.col(f"_p{j}").alias("src"),
            F.col("_id").alias("dst"),
            (
                F.col(f"_p{j}").isNotNull()
                & ((F.col("_us") - F.col(f"_p{j}us"))
                   <= F.lit(SESSION_GAP_US))
            ).alias("ok"),
        )
        for j in lags
    ])
    return (
        succ.select(F.explode(cand).alias("c"))
        .where(F.col("c.ok"))
        .select("c.src", "c.dst")
    )


def g03_wcc_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions as graph components: succession edges (one window
    pass), large-star/small-star WCC over event_id nodes, then one
    per-component aggregate. Scale shape: the edge build is a single
    partitionBy(user_id) window over the event scan; WCC is O(log n)
    parquet-staged rounds of two groupBy shuffles each; the final agg
    is one shuffle on component_id. No driver-side data, no
    diameter-bound iteration (a heavy user's month-long session chain
    converges in the same handful of rounds as a short one)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    edges = session_edges(spark, sf_dir, max_lag=1)
    labels = connected_components(
        edges, nodes=ev.select("event_id")
    )
    return (
        labels.join(ev, labels.node == ev.event_id)
        .groupBy(F.col("component_id").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            (
                F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))
            ).alias("span_us"),
        )
        .select("session_id", "n_events", "span_us")
    )


G03_SQL = f"""
WITH o AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_G03_GAP_US}
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT event_id, ts,
         user_id,
         SUM(brk) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM o
)
SELECT MIN(event_id) AS session_id,
       COUNT(*) AS n_events,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
FROM s
GROUP BY user_id, sid
"""


def g04_triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node exact triangle counts over the 2nd-order succession
    graph: within each user's timeline, edges link an event to its
    next AND next-next event when each pair is ≤ 12 h apart — so every
    within-window consecutive triple closes a triangle. Triangle
    participation is the local clustering signal (dense bursts score
    high, isolated events zero). Scale shape: the edge build is the
    same one user-window pass as g03 with two lags; the count uses
    degree-ordered orientation (operators/graph.py:triangle_counts) —
    wedges are generated only at each triangle's lowest-(degree,id)
    corner, bounding work at O(m^1.5) independent of hub skew."""
    edges = session_edges(spark, sf_dir, max_lag=2)
    return triangle_counts(edges).select(
        F.col("node").alias("event_id"), "n_triangles"
    )


G04_SQL = f"""
WITH s AS (
  SELECT event_id AS id, epoch_us(ts) AS us,
         lag(event_id, 1) OVER w AS p1, lag(epoch_us(ts), 1) OVER w AS p1us,
         lag(event_id, 2) OVER w AS p2, lag(epoch_us(ts), 2) OVER w AS p2us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
raw_e AS (
  SELECT p1 AS a, id AS b FROM s
  WHERE p1 IS NOT NULL AND us - p1us <= {_G03_GAP_US}
  UNION ALL
  SELECT p2, id FROM s
  WHERE p2 IS NOT NULL AND us - p2us <= {_G03_GAP_US}
),
edges AS (
  SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
  FROM raw_e WHERE a <> b
),
tri AS (
  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
  FROM edges e1
  JOIN edges e2 ON e2.lo = e1.hi
  JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
)
SELECT node AS event_id, COUNT(*) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS node FROM tri)
GROUP BY node
"""


# --------------------------------------------------------------------------
# w05 — fixed-size weighted sample per domain (Efraimidis–Spirtakis A-ES
# via the max-of-w-uniforms identity, operators/sampling.py:
# weighted_reservoir). Weight = document length in 64-char units
# (clamped 1..16), k = 5 per source. The oracle replays the integer
# priority construction directly (list_max over the same md5 prefixes),
# so an EXACT match machine-checks both the hash recipe and the top-k
# boundary on every group. Completes the sampler triad next to w01
# (Poisson-PPS) and w03 (uniform bottom-k).
# --------------------------------------------------------------------------
_W05_K = 5
_W05_CAP = 16


def w05_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted fixed-size per-domain sample: length-derived integer
    weights, priorities = max of w 56-bit md5 draws (computed in the
    scan, ≤ 16 md5s/row, zero shuffle), then the skew-safe two-window
    top-k. Scale shape: nothing here is data-sized but the scan itself;
    a mega-domain splits across 32 presplit buckets before the final
    ≤ 160-row-per-group ranking."""
    from ..operators.sampling import weighted_reservoir

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("(n_chars + 63) div 64").cast("bigint").alias("wgt_raw"),
    )
    out = weighted_reservoir(
        docs, ["source"], "doc_id", "wgt_raw", _W05_K, weight_cap=_W05_CAP
    )
    return out.select(
        "source",
        "doc_id",
        F.col("weight_clamped").alias("wgt"),
        "priority",
        "rank_in_group",
    ).orderBy("source", "rank_in_group")


W05_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         LEAST(GREATEST((n_chars + 63) // 64, 1), {_W05_CAP}) AS wgt
  FROM documents
),
pri AS (
  SELECT doc_id, source, wgt,
         list_max(list_transform(range(1, wgt + 1),
           j -> ('0x' || substr(md5('' || chr(1) || CAST(doc_id AS VARCHAR)
                 || chr(1) || CAST(j AS VARCHAR)), 1, 14))::BIGINT
         )) AS priority
  FROM w
)
SELECT source, doc_id, wgt, priority, rank_in_group FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY source ORDER BY priority DESC, doc_id
    ) AS BIGINT) AS rank_in_group
  FROM pri
) sub WHERE rank_in_group <= {_W05_K}
ORDER BY source, rank_in_group
"""


SPECS = [
    QuerySpec(
        "g03_wcc_sessions", g03_wcc_sessions, G03_SQL,
        "weakly-connected components (large-star/small-star) over the "
        "event-succession graph; oracle re-derives the partition via "
        "window sessionization",
    ),
    QuerySpec(
        "g04_triangle_participation", g04_triangle_participation, G04_SQL,
        "exact per-node triangle counts (degree-ordered orientation, "
        "O(m^1.5) wedges) over the 2nd-order succession graph; oracle "
        "replays the a<b<c 3-way join enumeration",
    ),
    QuerySpec(
        "w05_weighted_reservoir", w05_weighted_reservoir, W05_SQL,
        "fixed-size weighted sample per domain (A-ES via integer "
        "max-of-w-uniforms priorities, mergeable, skew-safe two-phase "
        "top-k); oracle replays the exact priority construction",
    ),
]
