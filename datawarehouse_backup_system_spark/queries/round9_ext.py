"""Round-9 extension specs: k-core decomposition (g05), personalized
PageRank (p02), and the exact containment join (d14).

g05 is the fourth graph primitive (after PageRank p01, WCC g03, triangles g04),
reusing the parquet-staged round machinery: coreness per node via
iterated neighborhood H-index refinement (Lü et al., "The H-index of
a network node and its relation to degree and coreness" — public
literature), `operators/graph.py:core_numbers`. Core number is a
standard link-quality / embeddedness prior for corpus curation:
low-core nodes are periphery (drive-by events, link-farm leaves),
high-core nodes sit in densely connected activity.

The spec graph is the 3rd-order session succession graph (each event
linked to its next, next-next and next-next-next within the 12 h
session gap — the g04 build plus one more lag), whose cores are
nontrivial ({1,2,3}: chain power graphs have degeneracy 3, broken
chains less). The DuckDB oracle UNROLLS the identical 12 refinement
rounds in SQL (window row_number H-index per round), so an EXACT
match machine-checks every round's join+window algebra; Spark's early
fixpoint stop is output-equivalent because post-fixpoint rounds are
no-ops. 12 rounds is convergence + margin on this data (pure-Python
simulator: sf0.01 converges in 8 rounds, sf0.1 in 10; pinned in
tests/test_graph_cc.py against a true peel).

Reference analog: none (the daemon has no graph analytics); extends
§2.6 the way g03/g04 do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import core_numbers
from .base import QuerySpec, load

#: session gap, exact integer microseconds on both engines (g03's)
from .round8_ext import SESSION_GAP_US as _G05_GAP_US  # one gap, one source
#: fixed refinement rounds replayed by the oracle; ≥ convergence on
#: the spec data (8 at sf0.01, 10 at sf0.1) with margin
_G05_ROUNDS = 12


def _session_edges_pow3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 session succession edges — delegates to THE shared
    builder (round8_ext.session_edges; review r11 consolidated the four
    hand-copied gap/edge twins into one parameterized function)."""
    from .round8_ext import session_edges

    return session_edges(spark, sf_dir, max_lag=3)


def g05_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core number per event over the 3rd-order session succession
    graph. Scale shape: the edge build is one user-window pass; each
    refinement round is one equi-join of the staged directed edge
    list against the current (node, val) labels plus a per-node
    descending-row_number window (max(rn) with val ≥ rn — the
    H-index without collect_list, hub-safe), parquet-staged rounds
    with an integer Observation signature for the fixpoint stop."""
    edges = _session_edges_pow3(spark, sf_dir)
    return core_numbers(edges, iterations=_G05_ROUNDS).select(
        F.col("node").alias("event_id"), "core"
    )


def _g05_sql() -> str:
    head = f"""
WITH s AS (
  SELECT event_id AS id, epoch_us(ts) AS us,
         lag(event_id, 1) OVER w AS p1, lag(epoch_us(ts), 1) OVER w AS p1us,
         lag(event_id, 2) OVER w AS p2, lag(epoch_us(ts), 2) OVER w AS p2us,
         lag(event_id, 3) OVER w AS p3, lag(epoch_us(ts), 3) OVER w AS p3us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
raw_e AS (
  SELECT p1 AS a, id AS b FROM s
  WHERE p1 IS NOT NULL AND us - p1us <= {_G05_GAP_US}
  UNION ALL
  SELECT p2, id FROM s
  WHERE p2 IS NOT NULL AND us - p2us <= {_G05_GAP_US}
  UNION ALL
  SELECT p3, id FROM s
  WHERE p3 IS NOT NULL AND us - p3us <= {_G05_GAP_US}
),
edges AS (
  SELECT DISTINCT LEAST(a, b) AS lo, GREATEST(a, b) AS hi
  FROM raw_e WHERE a <> b
),
d AS (
  SELECT lo AS a, hi AS b FROM edges
  UNION ALL
  SELECT hi, lo FROM edges
),
c0 AS (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS val FROM d GROUP BY a
)"""
    rounds = []
    for i in range(1, _G05_ROUNDS + 1):
        rounds.append(f""",
c{i} AS (
  SELECT a AS node,
         CAST(max(CASE WHEN val >= rn THEN rn END) AS BIGINT) AS val
  FROM (
    SELECT d.a, c.val,
           row_number() OVER (PARTITION BY d.a ORDER BY c.val DESC) AS rn
    FROM d JOIN c{i - 1} c ON d.b = c.node
  )
  GROUP BY a
)""")
    return (
        head
        + "".join(rounds)
        + f"\nSELECT node AS event_id, val AS core FROM c{_G05_ROUNDS}"
    )


G05_SQL = _g05_sql()


# --------------------------------------------------------------------------
# p02 — personalized (seeded) PageRank over event-type transitions
# --------------------------------------------------------------------------
_P02_ITERS = 3
_P02_DAMPING = 0.85
#: trusted entry points: teleport mass lands uniformly on these
_P02_SEEDS = ("signup", "purchase")


def p02_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded relevance propagation: same count-weighted transition
    graph as p01, but the teleport vector is uniform over the seed
    set — ranks measure proximity to the trusted entry points rather
    than global centrality. Same Pregel join shape per round; the
    seed flag is one broadcast join on the node vector."""
    ev = load(spark, sf_dir, "events")
    from ..operators import behavior
    from ..operators.graph import pagerank

    edges = behavior.path_transitions(
        ev, "user_id", "ts", "event_type", "event_id"
    )
    seeds = spark.createDataFrame(
        [(s,) for s in _P02_SEEDS], "node string"
    )
    return pagerank(
        edges, "src_type", "dst_type", "n",
        iterations=_P02_ITERS, damping=_P02_DAMPING, seeds=seeds,
    )


def _p02_sql() -> str:
    d = _P02_DAMPING
    seed_list = ", ".join(f"'{s}'" for s in _P02_SEEDS)
    head = f"""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
e AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
ne AS (
  SELECT e.src, e.dst, e.w / o.ow AS p
  FROM e JOIN (SELECT src, sum(w) AS ow FROM e GROUP BY src) o
    ON o.src = e.src
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e
  )
),
sn AS (
  SELECT CAST(count(*) AS DOUBLE) AS c
  FROM nodes WHERE node IN ({seed_list})
),
r0 AS (
  SELECT node,
         CASE WHEN node IN ({seed_list}) THEN 1.0 / sn.c ELSE 0.0 END
           AS rank
  FROM nodes CROSS JOIN sn
)"""
    iters = []
    for i in range(_P02_ITERS):
        iters.append(f""",
r{i + 1} AS (
  SELECT n.node,
         CASE WHEN n.node IN ({seed_list})
              THEN (1.0 - {d}) / sn.c ELSE 0.0 END
         + {d} * COALESCE(s.contrib, 0) AS rank
  FROM nodes n CROSS JOIN sn
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank * e.p) AS contrib
    FROM ne e JOIN r{i} r ON r.node = e.src GROUP BY e.dst
  ) s ON s.node = n.node
)""")
    tail = f"""
SELECT node, ROUND(rank, 6) AS rank FROM r{_P02_ITERS}"""
    return head + "".join(iters) + tail


P02_SQL = _p02_sql()




# --------------------------------------------------------------------------
# d14 — EXACT containment join (near-SUBSET dedup) via prefix filtering.
# The corpus plants template-wrapped twins (header + verbatim body +
# footer) for every 10th document: low Jaccard against their source
# when the body is short relative to the wrapper — the pair class
# resemblance thresholds keep — but containment(source → wrapped) = 1
# by construction. The oracle replays the FULL quadratic directional
# join, machine-checking the containment prefix-filter theorem.
# --------------------------------------------------------------------------
_D14_NUM, _D14_DEN = 8, 10
_D14_HDR = "begin template header block common across mirror sites"
_D14_FTR = "end template footer block shared across mirror sites"
_D14_OFFSET = 1_000_000


def _wrapped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # base docs sliced below the twin offset (review r11, the
    # _with_neardups rule): above it a wrapped id would collide with a
    # real doc_id and BOTH engines would merge two documents' token
    # sets under one id — identically wrong, oracle-blind. No-op on
    # every shipped fixture.
    docs = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _D14_OFFSET)
        .select("doc_id", "text")
    )
    wrapped = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(_D14_OFFSET)).alias("doc_id"),
        F.concat(
            F.lit(_D14_HDR + " "), F.col("text"), F.lit(" " + _D14_FTR)
        ).alias("text"),
    )
    return docs.unionByName(wrapped)


def d14_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional near-subset pairs over 3-gram shingles at
    containment >= 0.8. Scale shape: one shingle-docfreq shuffle, one
    per-doc ordered-array build, one equi-join of each contained
    doc's RAREST (prefix) shingles against the full inverted list,
    per-pair array_intersect verify — no cartesian, no probabilistic
    misses (operators/setjoin.py:prefix_containment_join)."""
    from ..operators.setjoin import prefix_containment_join

    return prefix_containment_join(
        _wrapped_corpus(spark, sf_dir), "doc_id", "text",
        threshold_num=_D14_NUM, threshold_den=_D14_DEN, shingle_n=3,
    )


D14_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_D14_OFFSET}
  UNION ALL
  SELECT doc_id + {_D14_OFFSET},
         '{_D14_HDR} ' || text || ' {_D14_FTR}'
  FROM documents WHERE doc_id % 10 = 0 AND doc_id < {_D14_OFFSET}
),
toks AS (
  SELECT doc_id, string_split_regex(regexp_replace(text, '^[ \\t\\n\\f\\r\\x0B]+|[ \\t\\n\\f\\r\\x0B]+$', '', 'g'), '[ \\t\\n\\f\\r\\x0B]+') AS t FROM corpus
),
tok AS (
  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS token
  FROM toks, UNNEST(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
),
n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_sub, id_super, n_inter, ns.n AS n_sub, np.n AS n_super,
       round(CAST(n_inter AS DOUBLE) / ns.n, 6) AS containment
FROM inter
JOIN n ns ON ns.doc_id = id_sub
JOIN n np ON np.doc_id = id_super
WHERE {_D14_DEN} * n_inter >= {_D14_NUM} * ns.n
"""


SPECS = [
    QuerySpec(
        "g05_kcore", g05_kcore, G05_SQL,
        "k-core decomposition (iterated neighborhood H-index "
        "refinement, parquet-staged rounds, hub-safe window H-index) "
        "over the 3rd-order session succession graph; oracle unrolls "
        "the identical 12 refinement rounds in SQL",
    ),
    QuerySpec(
        "p02_personalized_pagerank", p02_personalized_pagerank, P02_SQL,
        "personalized (seeded-teleport) PageRank over the event-type "
        "transition graph; oracle unrolls the identical 3 seeded "
        "iterations in SQL",
    ),
    QuerySpec(
        "d14_containment_join", d14_containment_join, D14_SQL,
        "EXACT directional containment join (near-subset dedup, "
        "SSJoin prefix filter) over 3-gram shingles with planted "
        "template-wrapped twins; oracle replays the full quadratic "
        "directional join",
    ),
]
