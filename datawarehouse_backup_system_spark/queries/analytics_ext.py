"""Round-4 analytics extensions: behavioral/event-sequence operators
(funnel, cohort retention, path transitions, rolling anomaly flags),
weighted PPS sampling, bloom-prefiltered semi-join, and product
quantization with ADC search + measured recall.

Every spec pairs the Spark plan with a DuckDB oracle that replays the
same relational algebra; all float-origin quantities are rounded into
integer micro-units (or kept in fixed-point cents) BEFORE any
comparison, argmin, or cross-group sum, so value hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import behavior
from .base import QuerySpec, load
from .relational import cents

_STEPS = ["view", "click", "purchase"]


# --------------------------------------------------------------------------
# a01 — ordered funnel: view → click → purchase completion counts
# --------------------------------------------------------------------------
def a01_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return behavior.funnel_counts(ev, "user_id", "ts", "event_type", _STEPS)


A01_SQL = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS step1_ts
  FROM events WHERE user_id IS NOT NULL
), s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > step1_ts THEN ts END)
              OVER (PARTITION BY user_id) AS step2_ts
  FROM s1
), s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > step2_ts THEN ts END)
              OVER (PARTITION BY user_id) AS step3_ts
  FROM s2
), per_user AS (
  SELECT user_id, min(step1_ts) AS t1, min(step2_ts) AS t2, min(step3_ts) AS t3
  FROM s3 GROUP BY user_id
)
SELECT 1 AS step_index, 'view' AS step, CAST(count(t1) AS BIGINT) AS n_entities
FROM per_user
UNION ALL
SELECT 2, 'click', CAST(count(t2) AS BIGINT) FROM per_user
UNION ALL
SELECT 3, 'purchase', CAST(count(t3) AS BIGINT) FROM per_user
"""


# --------------------------------------------------------------------------
# a02 — weekly cohort retention matrix
# --------------------------------------------------------------------------
def a02_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return behavior.cohort_retention(ev, "user_id", "ts")


A02_SQL = """
WITH active AS (
  SELECT user_id, CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk FROM events
), first AS (
  SELECT user_id, min(wk) AS cohort FROM active GROUP BY user_id
)
SELECT f.cohort AS cohort_week,
       a.wk - f.cohort AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_entities
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# a03 — top-n per group (partitioned window; contrast with q33's global rank)
# --------------------------------------------------------------------------
_A03_N = 5


def a03_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-n: the scale-safe shape (window partitioned on the
    group key — every partition ranks locally, no global sort), vs the
    global ranking of q33 which is inherently single-ordered."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _A03_N)
        .select("event_type", "event_id", "value", "rn")
    )


A03_SQL = f"""
SELECT event_type, event_id, value, rn FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= {_A03_N}
"""


# --------------------------------------------------------------------------
# a04 — Markov path-transition matrix (next-event counts)
# --------------------------------------------------------------------------
def a04_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return behavior.path_transitions(ev, "user_id", "ts", "event_type", "event_id")


A04_SQL = """
WITH seq AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst_type
  FROM events
)
SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE dst_type IS NOT NULL
GROUP BY src_type, dst_type
"""


# --------------------------------------------------------------------------
# a05 — rolling z-score anomaly flags (integer cross-multiplied test)
# --------------------------------------------------------------------------
def a05_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", cents(F.col("value")).alias("cents")
    )
    return behavior.rolling_anomaly_flags(
        ev, "event_type", "ts", "cents", "event_id",
        lookback=100, min_n=30, z_threshold=3,
    )


A05_SQL = """
WITH c AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), wnd AS (
  SELECT event_type, ts, event_id, cents,
         CAST(count(cents) OVER w AS BIGINT) AS n,
         -- HUGEINT sums mirror the operator's in-window DECIMAL(38,0)
         -- promotion: cents*cents alone can exceed int64 (review r8)
         sum(CAST(cents AS HUGEINT)) OVER w AS s,
         sum(CAST(cents AS HUGEINT) * cents) OVER w AS ssq
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, ts, event_id, cents, n AS n_window
FROM wnd
WHERE n >= 30
  -- HUGEINT promotion mirrors the operator's DECIMAL(38,0) products
  -- (review r8: raw 64-bit wrapped for ~1e8-cent values)
  AND (CAST(n AS HUGEINT) * cents - s) * (CAST(n AS HUGEINT) * cents - s)
      > 9 * (CAST(n AS HUGEINT) * ssq - CAST(s AS HUGEINT) * s)
"""


# --------------------------------------------------------------------------
# w01 — deterministic weighted (PPS) sampling with exact HT weights
# --------------------------------------------------------------------------
_W01_SCALE = 400
_W01_SALT = "w1"


def w01_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample

    docs = load(spark, sf_dir, "documents")
    return weighted_sample(
        docs, "doc_id", "n_chars", scale=_W01_SCALE, salt=_W01_SALT
    ).select("doc_id", "n_chars", "p_num", "p_den")


W01_SQL = f"""
SELECT doc_id, n_chars,
       CAST(least(n_chars, {_W01_SCALE}) AS BIGINT) AS p_num,
       CAST({_W01_SCALE} AS BIGINT) AS p_den
FROM documents
WHERE (CAST('0x' || substr(md5('{_W01_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) % 1000000)::HUGEINT * {_W01_SCALE}
      < n_chars::HUGEINT * 1000000  -- HUGEINT mirrors the r11 decimal promotion
"""


# --------------------------------------------------------------------------
# b01 — bloom-prefiltered semi-join (runtime-filter pattern, exact result)
# --------------------------------------------------------------------------
_B01_BAL = 9000


def b01_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of high-balance customers via ``bloom.bloom_semi_join``:
    the bloom probe filters the fact scan BEFORE the join exchange (the
    explicit form of Spark's InjectRuntimeFilter); the closing semi-join
    scrubs bloom false positives, so the oracle is the plain semi-join."""
    from ..operators.bloom import bloom_semi_join

    orders = load(spark, sf_dir, "orders")
    dim = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > _B01_BAL)
        .select("c_custkey")
    )
    return bloom_semi_join(orders, "o_custkey", dim, "c_custkey").select(
        "o_orderkey", "o_custkey"
    )


B01_SQL = f"""
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > {_B01_BAL})
"""


# --------------------------------------------------------------------------
# e04 / r06 — product quantization: codes + ADC-search recall
# --------------------------------------------------------------------------
_PQ_M = 8
_PQ_K = 16

_PQ_CODEBOOK_SQL = f"""
v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e0 FROM embeddings),
v AS (
  -- L2-normalize first: on unit vectors the ADC's L2 order agrees with
  -- the exact baseline's cosine order (FAISS cosine recipe)
  SELECT vec_id,
         CASE WHEN sqrt(list_dot_product(e0, e0)) = 0 THEN e0
              ELSE list_transform(e0, x -> x / sqrt(list_dot_product(e0, e0)))
         END AS e
  FROM v0
),
ranked AS (
  SELECT vec_id, e,
         row_number() OVER (
           ORDER BY CAST('0x' || substr(md5('pq' || CAST(vec_id AS VARCHAR)), 1, 8)
                         AS BIGINT) % 1000000,
                    vec_id
         ) - 1 AS code
  FROM v
),
seeds AS (SELECT code, e FROM ranked WHERE code < {_PQ_K}),
ss AS (SELECT unnest(range(0, {_PQ_M})) AS subspace),
cseeds AS (
  SELECT seeds.code, ss.subspace,
         list_slice(seeds.e, ss.subspace * 8 + 1, ss.subspace * 8 + 8) AS cv
  FROM seeds, ss
),
sub AS (
  SELECT v.vec_id, ss.subspace,
         list_slice(v.e, ss.subspace * 8 + 1, ss.subspace * 8 + 8) AS sv
  FROM v, ss
),
cand AS (
  SELECT sub.vec_id, sub.subspace, cseeds.code,
         CAST(floor((list_dot_product(sv, sv) + list_dot_product(cv, cv)
                     - 2 * list_dot_product(sv, cv)) * 1000000 + 0.5)
              AS BIGINT) AS d
  FROM sub JOIN cseeds USING (subspace)
),
codes AS (
  SELECT vec_id, subspace, code, d FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d, code) AS rn
    FROM cand
  ) WHERE rn = 1
)"""


def _pq_pipeline(spark: SparkSession, sf_dir: str):
    # the Arrow/numpy encode (bit-identical to the expression path —
    # parity pinned in tests/test_analytics_ext.py) carries the map:
    # m·k·sub_dim multiply-adds per row is exactly the shape interpreted
    # HOF lambdas are worst at and batched numpy is best at
    from ..operators.quantize import pq_encode_pandas, pq_seed_codebook

    emb = load(spark, sf_dir, "embeddings")
    codebook = pq_seed_codebook(emb, "vec_id", "embedding", m=_PQ_M, k=_PQ_K)
    codes = pq_encode_pandas(emb, "vec_id", "embedding", codebook, m=_PQ_M)
    return emb, codebook, codes


def e04_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding of the corpus: 8 sub-codebooks × 16 seed centroids,
    one (vec_id, subspace) row per code with its integer-micros squared
    distance — 4 bits/subspace, a 16× compression of the 32-byte float
    sub-vector."""
    _, _, codes = _pq_pipeline(spark, sf_dir)
    return codes.select("vec_id", "subspace", "code", "dist_micros")


E04_SQL = f"""
WITH {_PQ_CODEBOOK_SQL}
SELECT vec_id, subspace, code, d AS dist_micros FROM codes
"""


_R06_RERANK = 100


def r06_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of PQ/ADC search (shortlist + exact re-rank) vs the
    exact cosine baseline, per probe query — the honesty artifact every
    compressed-domain index owes. Pure-ADC top-3 is near chance on this
    weakly-clustered corpus (the quantization error is the size of the
    neighbor margins); the shortlist-then-refine form is how PQ is
    actually deployed."""
    from ..operators.quantize import pq_adc_topk
    from ..operators.similarity import brute_force_topk
    from .extras import _emb_queries, _recall_frame

    emb, q = _emb_queries(spark, sf_dir)
    _, codebook, codes = _pq_pipeline(spark, sf_dir)
    exact = brute_force_topk(emb, q, k=3)
    approx = pq_adc_topk(
        codes, "vec_id", q, "vec_id", "embedding", codebook, m=_PQ_M, k=3,
        rerank=_R06_RERANK, corpus=emb,
    )
    return _recall_frame(exact, approx)


_R06_APPROX_SQL = f"""
WITH {_PQ_CODEBOOK_SQL},
q AS (SELECT vec_id AS query_id, e FROM v
      -- the r11 absolute probe cap (llm_ops._probe_slice), missed
      -- here in the first pass (review r11 pass F)
      WHERE vec_id % 100 = 0 AND vec_id < 200000),
qsub AS (
  SELECT q.query_id, ss.subspace,
         list_slice(q.e, ss.subspace * 8 + 1, ss.subspace * 8 + 8) AS qv
  FROM q, ss
),
qtable AS (
  SELECT qsub.query_id, qsub.subspace, cseeds.code,
         CAST(floor((list_dot_product(qv, qv) + list_dot_product(cv, cv)
                     - 2 * list_dot_product(qv, cv)) * 1000000 + 0.5)
              AS BIGINT) AS qd
  FROM qsub JOIN cseeds USING (subspace)
),
scored AS (
  SELECT qtable.query_id, codes.vec_id AS neighbor_id,
         CAST(sum(qd) AS BIGINT) AS adc
  FROM codes JOIN qtable USING (subspace, code)
  WHERE codes.vec_id <> qtable.query_id
  GROUP BY 1, 2
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc ASC, neighbor_id ASC) AS srank
    FROM scored
  ) WHERE srank <= {_R06_RERANK}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         ROUND(list_dot_product(qe.e0, ne.e0)
               / NULLIF(sqrt(list_dot_product(qe.e0, qe.e0))
                        * sqrt(list_dot_product(ne.e0, ne.e0)), 0),
               6) AS score
  FROM shortlist s
  JOIN v0 qe ON qe.vec_id = s.query_id
  JOIN v0 ne ON ne.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM rer
) WHERE rank <= 3
"""


def _r06_sql() -> str:
    from .extras import _recall_sql

    return _recall_sql(_R06_APPROX_SQL)


SPECS = [
    QuerySpec("a01_funnel_counts", a01_funnel_counts, A01_SQL,
              "ordered funnel completion counts (view→click→purchase)"),
    QuerySpec("a02_cohort_retention", a02_cohort_retention, A02_SQL,
              "weekly cohort-retention matrix by first-activity week"),
    QuerySpec("a03_topn_per_group", a03_topn_per_group, A03_SQL,
              "per-group top-n via partitioned window (no global sort)"),
    QuerySpec("a04_path_transitions", a04_path_transitions, A04_SQL,
              "Markov next-event transition matrix per user"),
    QuerySpec("a05_anomaly_zscore", a05_anomaly_zscore, A05_SQL,
              "rolling z-score anomaly flags (integer cross-multiplied)"),
    QuerySpec("w01_weighted_sample", w01_weighted_sample, W01_SQL,
              "deterministic PPS weighted sampling with exact HT weights"),
    QuerySpec("b01_bloom_semi_join", b01_bloom_semi_join, B01_SQL,
              "bloom-prefiltered semi-join (explicit runtime filter)"),
    QuerySpec("e04_pq_codes", e04_pq_codes, E04_SQL,
              "product-quantization encoding (8×16 seed codebooks)"),
    QuerySpec("r06_recall_pq", r06_recall_pq, _r06_sql(),
              "recall@3 of PQ/ADC compressed-domain search vs exact"),
]


# r7 consolidation (COVERAGE.md): a03 -> q22 (per-group top-n window;
# events-table variant pinned in tests/test_folded_twins.py), e04 -> r06
# (the PQ/ADC recall replay re-encodes with the same codebooks).
_FOLDED = {"a03_topn_per_group", "e04_pq_codes",
           # candidate batch: w01 -> w03 (PPS weighted vs bottom-k
           # uniform sampling; HT-weight math kept in the replay)
           "w01_weighted_sample"}
FOLDED_SPECS = [s for s in SPECS if s.name in _FOLDED]
SPECS = [s for s in SPECS if s.name not in _FOLDED]
