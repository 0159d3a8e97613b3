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

from ..operators.graph import connected_components
from .base import QuerySpec, load

#: session gap: consecutive same-user events at most 12 h apart are
#: linked. Compared in exact integer MICROSECONDS on both engines —
#: second-truncation could flip a boundary edge between engines.
_G03_GAP_US = 43_200 * 1_000_000


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
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    succ = ev.select(
        "event_id",
        F.unix_micros("ts").alias("_us"),
        F.lag("event_id").over(w).alias("_prev_id"),
        F.lag(F.unix_micros("ts")).over(w).alias("_prev_us"),
    )
    edges = succ.where(
        F.col("_prev_id").isNotNull()
        & ((F.col("_us") - F.col("_prev_us")) <= F.lit(_G03_GAP_US))
    ).select(
        F.col("_prev_id").alias("src"), F.col("event_id").alias("dst")
    )
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


SPECS = [
    QuerySpec(
        "g03_wcc_sessions", g03_wcc_sessions, G03_SQL,
        "weakly-connected components (large-star/small-star) over the "
        "event-succession graph; oracle re-derives the partition via "
        "window sessionization",
    ),
]
