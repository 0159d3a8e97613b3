"""Round-10 extension specs: HyperBall neighborhood function under an
exact-BFS tolerance oracle (g06) and ExactSubstr duplicated-span
REMOVAL (t33).

g06 promotes the r9 HyperBall implementation
(`operators/graph.py:neighborhood_function`) from pytest-only evidence
to a driver spec (VERDICT r9 item 1) using the q30/q44 pattern for
engine-specific estimators: the Spark side computes BOTH the HLL-sketch
estimate AND the exact radius-capped BFS neighborhood count in one
query, emitting the exact counts plus an ``est_ok`` tolerance boolean;
the DuckDB oracle replays the exact BFS (unrolled distinct-pair
expansion — radius 3 on a lag-1 session-succession graph stays linear,
ball ≤ 2r+1 on chains) and asserts the same flags TRUE. On ball sizes
this small the DataSketches HLL is in sparse (exact) mode, so the flags
are deterministically true; the tolerance (max(1, 5%)) is the
documented estimator contract, not the observed error.

t33 closes the measure→fix gap in the text-dedup family (VERDICT r9
item 5): t21/`dup_spans` COUNTS cross-document duplicated 8-token
spans; `operators/text.py:remove_dup_spans` CUTS them from every
non-canonical holder (Lee et al. 2022 semantics, distributed
rolling-span approximation). The oracle replays span hashing, canonical
selection, token-level coverage and ordered reconstruction with
unnest + string_agg(... ORDER BY).

Reference analog: none (the daemon has no graph analytics and no text
dedup); extends §2.6 the way g03/g04/g05 and t21 do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text
from ..operators.graph import _canon, _directed, neighborhood_function
from .base import QuerySpec, load

# --------------------------------------------------------------------------
# g06 — HyperBall neighborhood function vs exact BFS (tolerance oracle)
# --------------------------------------------------------------------------
#: session gap (12 h), exact integer microseconds on both engines (g03/g05)
_G06_GAP_US = 43_200 * 1_000_000
_G06_RADIUS = 3
#: quarter of the users: bounds the oracle's unrolled pair expansion as
#: sf grows while keeping thousands of real chain edges
_G06_USER_MOD = 4


def _g06_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) lag-1 session-succession edges over a quarter of the
    users — ONE user-window pass (the g04/g05 build, single lag)."""
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") % _G06_USER_MOD == 0)
        .select("event_id", "user_id", "ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    succ = ev.select(
        F.col("event_id").alias("dst"),
        F.lag("event_id").over(w).alias("src"),
        (us - F.lag(us).over(w)).alias("_gap_us"),
    )
    return succ.where(
        F.col("src").isNotNull() & (F.col("_gap_us") <= _G06_GAP_US)
    ).select("src", "dst")


def _g06_directed(edges: DataFrame) -> DataFrame:
    """Canonical directed (a, b) edge list from a (src, dst) frame —
    the BFS's join side. Referenced by R+1 subtrees of the expansion
    (nodes + one join per round); deliberately NOT persisted — the
    sf0.1 A/B measured recompute at 2.37 s vs 4.43 s persisted (cache
    build + lost AQE on the cached subtree outweigh 4 re-evaluations
    of a cheap windowed edge build). At cluster scale the edge side
    the per-round machinery actually hammers is staged inside
    neighborhood_function already."""
    return _directed(
        _canon(
            edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
    )


def _g06_exact_wide(d: DataFrame) -> DataFrame:
    """Exact radius-capped BFS ball sizes over a directed (a, b) edge
    frame, WIDE: (v, _n0.._n{R}) with _nr = |{u : dist(v, u) <= r}|.
    Shared by g06 (stacked to long form) and h06 (consumed wide for
    the harmonic sum).

    r11 optimization (guide §2.4): the old shape accumulated a
    distinct pair set per radius and UNIONED four per-radius groupBys,
    each carrying its own full copy of the expansion lineage — Spark
    plans no cross-subtree reuse here (measured: 78 Exchange nodes /
    68 parquet scans in the final adaptive plan, zero ReusedExchange).
    This shape runs ONE frontier expansion that tracks each pair's
    first-reach radius (union + min-agg per round — textbook BFS
    layering, so ``fr`` is the true distance), then ONE conditional-sum
    aggregation emits every cumulative ball size. Counts are provably
    identical: |ball(v, r)| = #{u : fr(v, u) <= r}; the pair set
    itself stays linear on this chain-like graph (ball <= 2r+1),
    unchanged."""
    nodes = d.select(F.col("a").alias("v")).distinct()
    # Disjoint join-side names (_ja/_jb): `reached` accumulates d's
    # lineage after round 1, so d["b"] would be an ambiguous self-join
    dj = d.select(F.col("a").alias("_ja"), F.col("b").alias("_jb"))
    reached = nodes.select(
        "v", F.col("v").alias("u"), F.lit(0).alias("fr")
    )
    for r in range(1, _G06_RADIUS + 1):
        cand = (
            reached.where(F.col("fr") == r - 1)
            .join(dj, F.col("u") == F.col("_ja"))
            .select("v", F.col("_jb").alias("u"), F.lit(r).alias("fr"))
        )
        # min-agg both dedups this round's candidates and keeps the
        # first-reach radius for pairs seen earlier (BFS invariant)
        reached = (
            reached.unionByName(cand)
            .groupBy("v", "u")
            .agg(F.min("fr").alias("fr"))
        )
    return reached.groupBy("v").agg(
        *[
            F.sum(
                F.when(F.col("fr") <= r, F.lit(1)).otherwise(F.lit(0))
            ).cast("bigint").alias(f"_n{r}")
            for r in range(_G06_RADIUS + 1)
        ]
    )


def _g06_exact_bfs(d: DataFrame) -> DataFrame:
    """Long-form exact BFS counts (v, radius, n_reachable), radius
    0..R over a directed (a, b) edge frame — :func:`_g06_exact_wide`
    stacked (one generate, no join)."""
    wide = _g06_exact_wide(d)
    stack_args = ", ".join(
        f"{r}, _n{r}" for r in range(_G06_RADIUS + 1)
    )
    return wide.select(
        "v",
        F.expr(
            f"stack({_G06_RADIUS + 1}, {stack_args}) "
            "as (radius, n_reachable)"
        ),
    )


def g06_hyperball_neighborhood(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-node neighborhood function to radius 3: exact BFS counts
    (hash-compared against the oracle's unrolled expansion) plus the
    HyperBall estimate's tolerance flag. The BFS pair set stays linear
    on this chain-like graph (ball ≤ 2r+1); the HyperBall side is the
    real staged-sketch machinery — per-node state one 2^12-register
    HLL regardless of reach, the 100 TB shape exact BFS cannot take
    (n² frontier state). Early sketch saturation (possible on short
    chains) is filled forward from the node's last emitted radius —
    a saturated ball is constant by definition."""
    # no persist on the directed edge list: an interleaved A/B at
    # sf0.1 measured the recompute BFS at 2.37 s vs 4.43 s persisted
    # (cache build + lost AQE on the cached subtree cost more than the
    # 4 re-evaluations of a cheap edge build; the r10 bucketed-staging
    # lesson again) — see OPTIMIZATION_r11.md
    exact = _g06_exact_bfs(_g06_directed(_g06_edges(spark, sf_dir)))
    # HyperBall estimates; saturation fill-forward per node. r11: the
    # fill is a last-non-null window over the JOINED frame, not a
    # separate max-radius subquery — the old `last` frame was a second
    # full reference to nf, which under the unrolled lazy tier re-ran
    # the whole sketch pipeline (the staged tier had hidden that cost
    # behind parquet-backed rounds). Identical semantics: the staged
    # early stop only ever omits a contiguous TAIL of radii, so
    # carrying the last emitted estimate forward equals the old
    # "fill from the node's max emitted radius".
    nf = neighborhood_function(
        _g06_edges(spark, sf_dir), max_radius=_G06_RADIUS
    )
    est = exact.join(
        nf.withColumnRenamed("node", "v"), ["v", "radius"], "left"
    )
    wfill = (
        Window.partitionBy("v")
        .orderBy("radius")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last("n_reachable_est", ignorenulls=True).over(wfill)
    tol = F.greatest(F.lit(1.0), F.lit(0.05) * F.col("n_reachable"))
    return est.select(
        F.col("v").alias("event_id"),
        "radius",
        F.col("n_reachable").cast("bigint").alias("n_reachable"),
        (F.abs(filled - F.col("n_reachable")) <= tol).alias("est_ok"),
    )


_G06_CTE = f"""
WITH ev AS (
  SELECT event_id, user_id, ts FROM events
  WHERE user_id % {_G06_USER_MOD} = 0
),
succ AS (
  SELECT lag(event_id) OVER w AS src, event_id AS dst,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
canon AS (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM succ
  WHERE src IS NOT NULL AND gap_us <= {_G06_GAP_US} AND src <> dst
),
d AS (SELECT lo AS a, hi AS b FROM canon
      UNION ALL SELECT hi, lo FROM canon),
nodes AS (SELECT DISTINCT a AS v FROM d),
p0 AS (SELECT v, v AS u FROM nodes),
p1 AS (SELECT DISTINCT v, u FROM (
  SELECT v, u FROM p0
  UNION ALL SELECT p0.v, d.b AS u FROM p0 JOIN d ON p0.u = d.a)),
p2 AS (SELECT DISTINCT v, u FROM (
  SELECT v, u FROM p1
  UNION ALL SELECT p1.v, d.b AS u FROM p1 JOIN d ON p1.u = d.a)),
p3 AS (SELECT DISTINCT v, u FROM (
  SELECT v, u FROM p2
  UNION ALL SELECT p2.v, d.b AS u FROM p2 JOIN d ON p2.u = d.a))
"""

G06_SQL = _G06_CTE + """
SELECT v AS event_id, CAST(r AS INT) AS radius,
       CAST(n AS BIGINT) AS n_reachable, TRUE AS est_ok
FROM (
  SELECT v, 0 AS r, count(*) AS n FROM p0 GROUP BY v
  UNION ALL SELECT v, 1, count(*) FROM p1 GROUP BY v
  UNION ALL SELECT v, 2, count(*) FROM p2 GROUP BY v
  UNION ALL SELECT v, 3, count(*) FROM p3 GROUP BY v
)
"""

H06_SQL = _G06_CTE + """,
c0 AS (SELECT v, count(*) AS n0 FROM p0 GROUP BY v),
c1 AS (SELECT v, count(*) AS n1 FROM p1 GROUP BY v),
c2 AS (SELECT v, count(*) AS n2 FROM p2 GROUP BY v),
c3 AS (SELECT v, count(*) AS n3 FROM p3 GROUP BY v)
SELECT v AS event_id,
       round((n1 - n0) / 1.0 + (n2 - n1) / 2.0 + (n3 - n2) / 3.0, 6)
         AS harmonic,
       TRUE AS h_ok
FROM c0 JOIN c1 USING (v) JOIN c2 USING (v) JOIN c3 USING (v)
"""


# --------------------------------------------------------------------------
# h06 — approximate harmonic centrality vs exact BFS harmonic
# --------------------------------------------------------------------------


def h06_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-truncated harmonic centrality
    H_R(v) = Σ_{t=1..R} (|N_t(v)| − |N_{t−1}(v)|)/t over the g06 graph:
    the exact value from BFS counts (hash-compared; computed as ONE
    fixed left-associated expression over the pivoted counts so the FP
    result is bit-identical to the oracle's) plus the HyperBall
    estimator's tolerance flag. `harmonic_centrality_approx` truncates
    at the sketch run's last emitted radius; a saturated ball
    contributes zero to later terms, so early stop is sum-equivalent."""
    from ..operators.graph import harmonic_centrality_approx

    # wide frame straight from the one-lineage BFS (r11 optimization;
    # see _g06_exact_wide) — the old long->wide re-pivot is gone. No
    # persist on the edge list (measured slower at sf0.1; the g06 A/B)
    edges = _g06_edges(spark, sf_dir)
    wide = _g06_exact_wide(_g06_directed(edges))
    h_exact = (
        (F.col("_n1") - F.col("_n0")) / F.lit(1.0)
        + (F.col("_n2") - F.col("_n1")) / F.lit(2.0)
        + (F.col("_n3") - F.col("_n2")) / F.lit(3.0)
    )
    approx = harmonic_centrality_approx(
        neighborhood_function(edges, max_radius=_G06_RADIUS)
    ).select(F.col("node").alias("v"), F.col("harmonic").alias("_h_app"))
    joined = wide.select("v", h_exact.alias("_h_ex")).join(
        approx, "v", "left"
    )
    tol = F.greatest(F.lit(0.05) * F.col("_h_ex"), F.lit(0.05))
    return joined.select(
        F.col("v").alias("event_id"),
        F.round(F.col("_h_ex"), 6).alias("harmonic"),
        (
            F.abs(F.coalesce(F.col("_h_app"), F.lit(0.0)) - F.col("_h_ex"))
            <= tol
        ).alias("h_ok"),
    )


# --------------------------------------------------------------------------
# t33 — duplicated-span removal (the fix to what t21 measures)
# --------------------------------------------------------------------------
_T33_N = 8


def t33_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.text.remove_dup_spans over the t21 fixture slice:
    every 8-token span held by ≥2 distinct docs is cut from all
    non-canonical (non-MIN-id) holders; kept tokens re-join in
    original order. doc_id < 500 bounds oracle cost as sf grows
    (the t21 convention)."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return text.remove_dup_spans(docs, "doc_id", "text", n=_T33_N)


T33_SQL = rf"""
WITH d AS (
  SELECT doc_id, string_split_regex(regexp_replace(text, '^[ \t\n\f\r\x0B]+|[ \t\n\f\r\x0B]+$', '', 'g'), '[ \t\n\f\r\x0B]+') AS t
  FROM documents WHERE doc_id < 500
),
spans AS (
  SELECT doc_id, i AS start,
         ('0x' || substr(md5(array_to_string(t[i+1:i+{_T33_N}], ' ')),
                         1, 14))::BIGINT AS span_h
  FROM d, UNNEST(range(len(t) - {_T33_N - 1})) AS u(i)
  WHERE len(t) >= {_T33_N}
),
per_span AS (
  SELECT span_h, COUNT(DISTINCT doc_id) AS docs, MIN(doc_id) AS canon
  FROM spans GROUP BY span_h
),
cutpos AS (
  SELECT DISTINCT s.doc_id, s.start + q.j AS p
  FROM spans s
  JOIN per_span ps USING (span_h), UNNEST(range({_T33_N})) AS q(j)
  WHERE ps.docs >= 2 AND s.doc_id <> ps.canon
),
protpos AS (
  SELECT DISTINCT s.doc_id, s.start + q.j AS p
  FROM spans s
  JOIN per_span ps USING (span_h), UNNEST(range({_T33_N})) AS q(j)
  WHERE ps.docs >= 2 AND s.doc_id = ps.canon
),
cov AS (
  SELECT doc_id, p FROM cutpos
  EXCEPT
  SELECT doc_id, p FROM protpos
),
pos AS (
  SELECT doc_id, u.p, t[u.p + 1] AS tok
  FROM d, UNNEST(range(len(t))) AS u(p)
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
  WHERE cov.p IS NULL
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT d2.doc_id,
       CAST(len(d2.t) AS BIGINT) AS n_tokens,
       CAST(len(d2.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.text_clean, '') AS text_clean
FROM d AS d2 LEFT JOIN agg a USING (doc_id)
"""


SPECS = [
    QuerySpec(
        "g06_hyperball_neighborhood", g06_hyperball_neighborhood, G06_SQL,
        "HyperBall per-node neighborhood function to radius 3 vs the "
        "exact BFS counts (tolerance-boolean oracle, q30 pattern) over "
        "the lag-1 session succession graph",
    ),
    QuerySpec(
        "h06_harmonic_centrality", h06_harmonic_centrality, H06_SQL,
        "radius-truncated approximate harmonic centrality (HyperBall "
        "estimator) vs the exact BFS harmonic (tolerance-boolean "
        "oracle) over the lag-1 session succession graph",
    ),
    QuerySpec(
        "t33_remove_dup_spans", t33_remove_dup_spans, T33_SQL,
        "cross-document duplicated 8-token span REMOVAL (canonical "
        "holder keeps, others cut; order-preserving reconstruction); "
        "oracle replays hashing, coverage and ordered re-join",
    ),
]
