"""Round-7 extension specs: frequent-pattern co-occurrence mining.

The analytics family (funnels, cohorts, paths, anomaly flags) lacked the
one classic frequent-pattern primitive — market-basket pair support/lift
(the A-priori first pass). ``operators/behavior.py:pair_support``
implements it as a candidate-bound basket self-join (Σ C(k,2) work,
never |df|²); the spec here mines co-occurring event types per
(user, day) basket over the events table, with the standard exactness
recipes (integer milli-lift via `div`) so the plan hash-matches DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.behavior import pair_support
from .base import QuerySpec, load

_A08_MINSUP = 5


def a08_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurring event-type pairs per (user, day) basket: support,
    per-item basket counts, and exact integer milli-lift. Scale shape:
    the self-join is keyed on the basket tuple and bounded by
    C(|event types|, 2) pairs per basket; item counts and the basket
    total are broadcast frames (see pair_support docstring)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        "event_type",
    )
    return pair_support(
        ev, ["user_id", "d"], "event_type", min_support=_A08_MINSUP
    ).select(
        F.col("item_a").alias("type_a"),
        F.col("item_b").alias("type_b"),
        "support", "n_a", "n_b", "lift_milli",
    )


A08_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type FROM events
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS support
  FROM baskets a
  JOIN baskets b
    ON a.user_id = b.user_id AND a.d = b.d
   AND a.event_type < b.event_type
  GROUP BY 1, 2
),
counts AS (SELECT event_type, COUNT(*) AS n FROM baskets GROUP BY 1),
total AS (
  SELECT COUNT(*) AS n_baskets
  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
)
SELECT type_a, type_b, support, ca.n AS n_a, cb.n AS n_b,
       -- HUGEINT intermediates mirror the Spark side's DECIMAL(38,0):
       -- the product overflows int64 at scale, the quotient never does
       CAST((CAST(support AS HUGEINT) * n_baskets * 1000)
            // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT) AS lift_milli
FROM pairs
JOIN counts ca ON ca.event_type = type_a
JOIN counts cb ON cb.event_type = type_b
CROSS JOIN total
WHERE support >= {_A08_MINSUP}
"""


SPECS = [
    QuerySpec("a08_pair_support", a08_pair_support, A08_SQL,
              "market-basket pair support/lift (A-priori first pass) "
              "per (user, day) basket"),
]
