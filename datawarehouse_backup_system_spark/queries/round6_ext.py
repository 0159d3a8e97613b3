"""Round-6 extension specs: incremental aggregate maintenance, per-file
bloom point-lookup pruning, distributed 2-D skyline, dyadic EWMA,
split-conformal thresholds, and log₂ (DDSketch-style) histograms.

Every spec follows the repo's exactness recipes (queries/base.py):
integer cents, rational threshold comparisons, `div` floor division,
md5-derived deterministic hashing — so each Spark plan hash-matches its
DuckDB oracle at sf0.01 under the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quantiles as qsk
from ..operators.behavior import ewma_dyadic
from ..operators.calibration import conformal_threshold
from ..operators.hashing import md5_prefix_long
from ..operators.incremental import finalize, merge_partials, partial_aggs
from ..operators.skyline import skyline_2d
from .base import QuerySpec, load
from .relational import cents


# --------------------------------------------------------------------------
# u06 — incremental aggregate-view maintenance: fold a new batch into a
# materialized summary by monoid merge; equals the full recompute the
# oracle performs. History is partitioned off by date so the "view" and
# the "batch" are disjoint scans — the merge itself never rescans
# history (operators/incremental.py docstring has the 100 TB argument).
# --------------------------------------------------------------------------
_U06_SPLIT = "1997-01-01"


def u06_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderdate",
        cents(F.col("o_totalprice")).alias("price_c"),
    )
    # NULL-exhaustive split (review r11): a NULL date fails BOTH < and
    # >= and would vanish from the maintained view while the oracle's
    # full recompute keeps it — route NULLs into history explicitly
    is_batch = F.coalesce(
        F.col("o_orderdate") >= F.lit(_U06_SPLIT), F.lit(False)
    )
    history = orders.where(~is_batch)
    batch = orders.where(is_batch)
    view = partial_aggs(history, ["o_orderpriority"], "price_c")
    updated = merge_partials(
        view, partial_aggs(batch, ["o_orderpriority"], "price_c"),
        ["o_orderpriority"],
    )
    return finalize(updated).select(
        "o_orderpriority", "n_rows", "sum_v", "min_v", "max_v", "avg_floor"
    )


U06_SQL = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c) AS BIGINT) AS sum_v,
       min(c) AS min_v,
       max(c) AS max_v,
       -- count(c), not count(*): finalize divides by the non-null
       -- value count (r11 n_vals fix); latent until a NULL price
       CAST(sum(c) AS BIGINT) // count(c) AS avg_floor
FROM (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders
)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# z03 — per-"file" bloom index for point lookups, engine-portable replay
# of the real on-disk API (plans/table_format.py:write_bloom_manifest /
# bloom_candidate_files — pytest-verified on actual files; xxhash64
# there, md5 here because the oracle must reproduce the bits). lineitem
# is range-clustered into 32 simulated files by l_orderkey; the probe
# column l_partkey is uncorrelated with that layout, so min/max stats
# CANNOT prune (every file spans the probe). The filter is sized like a
# real one: 256 words x 61 usable bits (~2 KB/file — the same map<word,
# bits> shape the on-disk manifest stores), k=3 md5 positions; a single
# 64-bit word would saturate at file cardinality and admit everything.
# 61 = largest prime < 63, keeping every shift below the sign bit.
# --------------------------------------------------------------------------
_Z03_FILES = 32
_Z03_WORDS = 256
_Z03_BITS = _Z03_WORDS * 61
_Z03_PROBE = 7          # l_partkey literal probed


def _z03_pos(key_sql: str, i: int) -> str:
    """SQL for md5-derived bit position i of ``key_sql`` in [0, m)."""
    return (
        f"cast(conv(substr(md5(cast({key_sql} as string)),"
        f" {i * 8 + 1}, 8), 16, 10) as bigint) % {_Z03_BITS}"
    )


def z03_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # per_file rides the plan as a broadcast 1-row aggregate (review
    # r11, the q49/q51/skyline pattern): the old driver-side .first()
    # ran an extra full lineitem scan job just to bake a Python literal
    # into the expressions, and crashed with TypeError on an empty
    # table (NULL max). In-lineage, an empty table flows to an empty
    # result.
    params = li.agg(
        F.expr(
            f"cast((max(l_orderkey) + {_Z03_FILES}) div {_Z03_FILES}"
            " as bigint)"
        ).alias("_pf")
    )
    rows = li.crossJoin(F.broadcast(params)).select(
        F.expr("(l_orderkey - 1) div _pf").alias("file_id"),
        "l_partkey",
    )
    # one explode(x3) + one (file, word)-keyed bit_or builds every
    # file's multi-word bloom in a single aggregation — the identical
    # shape write_bloom_manifest uses on real files
    pos = F.explode(F.array(
        *[F.expr(_z03_pos("l_partkey", i)) for i in range(3)]
    )).alias("pos")
    blooms = (
        rows.select("file_id", pos)
        .select(
            "file_id",
            F.expr("pos div 61").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 61 as int))")
            .alias("m"),
        )
        .groupBy("file_id", "w")
        .agg(F.expr("bit_or(m)").alias("bloom"))
    )
    actual = rows.groupBy("file_id").agg(
        F.max((F.col("l_partkey") == _Z03_PROBE).cast("int"))
        .cast("boolean").alias("actual")
    )
    # probe positions via the SAME _z03_pos helper the build side uses —
    # an inline twin of the hash recipe could drift and silently return
    # candidate=false for files that do contain the key (review r8)
    probe = spark.range(1).select(
        F.explode(F.array(
            *[F.expr(_z03_pos(str(_Z03_PROBE), i)) for i in range(3)]
        )).alias("pos")
    ).select(
        F.expr("pos div 61").alias("w"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 61 as int))")
        .alias("mask"),
    )
    checked = (
        actual.select("file_id").crossJoin(F.broadcast(probe))
        .join(blooms, ["file_id", "w"], "left")
        .groupBy("file_id")
        .agg(
            F.min(
                F.col("bloom").isNotNull()
                & (F.col("bloom").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("candidate")
        )
    )
    return checked.join(actual, "file_id").select(
        "file_id", "candidate", "actual"
    ).orderBy("file_id")


Z03_SQL = f"""
WITH params AS (
  SELECT (max(l_orderkey) + {_Z03_FILES}) // {_Z03_FILES} AS per_file
  FROM lineitem
),
rows_b AS (
  SELECT (l_orderkey - 1) // per_file AS file_id, l_partkey
  FROM lineitem, params
),
pos AS (
  SELECT file_id,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), i * 8 + 1, 8))::BIGINT
           % {_Z03_BITS} AS pos
  FROM rows_b, (SELECT unnest([0, 1, 2]) AS i)
),
blooms AS (
  SELECT file_id, pos // 61 AS w,
         bit_or(1::BIGINT << CAST(pos % 61 AS INT)) AS bloom
  FROM pos GROUP BY 1, 2
),
actual AS (
  SELECT file_id,
         max(CASE WHEN l_partkey = {_Z03_PROBE} THEN 1 ELSE 0 END) = 1 AS actual
  FROM rows_b GROUP BY file_id
),
probe AS (
  SELECT ('0x' || substr(md5('{_Z03_PROBE}'), i * 8 + 1, 8))::BIGINT
           % {_Z03_BITS} AS pos
  FROM (SELECT unnest([0, 1, 2]) AS i)
),
checked AS (
  SELECT a.file_id,
         bool_and(b.bloom IS NOT NULL
                  AND (b.bloom & (1::BIGINT << CAST(p.pos % 61 AS INT)))
                      = (1::BIGINT << CAST(p.pos % 61 AS INT))) AS candidate
  FROM actual a
  CROSS JOIN probe p
  LEFT JOIN blooms b ON b.file_id = a.file_id AND b.w = p.pos // 61
  GROUP BY a.file_id
)
SELECT c.file_id, c.candidate, a.actual
FROM checked c JOIN actual a ON a.file_id = c.file_id
ORDER BY c.file_id
"""


# --------------------------------------------------------------------------
# y01 — 2-D skyline (Pareto frontier) over part: minimize retail price,
# maximize size. Spark plan is the bucketed prefix-max scan in
# operators/skyline.py (one groupBy + one bucket-local window — never
# the quadratic join); the oracle replays the NOT EXISTS dominance
# definition, so the window algebra is checked against the textbook
# semantics.
# --------------------------------------------------------------------------
def y01_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        cents(F.col("p_retailprice")).alias("price_c"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return skyline_2d(part, "price_c", "size").select(
        F.col("x").alias("price_c"), F.col("y").alias("size"), "n"
    ).orderBy("price_c", "size")


Y01_SQL = """
WITH pts AS (
  SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS size,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2
)
SELECT price_c, size, n
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_c <= p.price_c AND q.size >= p.size
    AND (q.price_c < p.price_c OR q.size > p.size)
)
ORDER BY price_c, size
"""


# --------------------------------------------------------------------------
# g02 — dyadic-exact EWMA (α = 1/2, 16-term window) over each user's
# event-value series; latest smoothed level per user. The one EWMA whose
# arithmetic is exact in both engines (operators/behavior.py docstring).
# --------------------------------------------------------------------------
def g02_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents(F.col("value")).alias("c")
    )
    return ewma_dyadic(
        ev, "user_id", ["ts", "event_id"], "c", k_window=16
    ).orderBy("user_id")


_G02_NUM = " + ".join(
    f"coalesce(lag(c, {j}) OVER w, 0) * {1 << (15 - j)}" for j in range(16)
)
_G02_M = " + ".join(
    f"CASE WHEN lag(c, {j}) OVER w IS NULL THEN 0 ELSE 1 END"
    for j in range(16)
)
G02_SQL = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL  -- matches ewma_dyadic's up-front NULL drop
),
lagged AS (
  SELECT user_id,
         CAST({_G02_NUM} AS BIGINT) AS ewma_num,
         CAST({_G02_M} AS BIGINT) AS m_terms,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, m_terms, ewma_num,
       CAST(65536 - (1::BIGINT << (16 - m_terms)) AS BIGINT) AS ewma_den,
       CAST((ewma_num::HUGEINT * 1000)
            // (65536 - (1::BIGINT << (16 - m_terms))) AS BIGINT)
         AS ewma_milli
FROM lagged WHERE rn = 1
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# c04 — split-conformal prediction threshold per event_type: k-th order
# statistic on an md5-hash calibration split, exact-integer rank and
# coverage (operators/calibration.py:conformal_threshold).
# --------------------------------------------------------------------------
def c04_conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL drop matches g02/h05: a NULL score would rank NULLS FIRST on
    # Spark but NULLS LAST in the DuckDB oracle, shifting the k-th
    # order statistic (review r8; latent — fixture has no NULL values)
    ev = load(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    ).select(
        "event_type",
        "event_id",
        cents(F.col("value")).alias("score"),
        (
            # THE hash recipe, imported not inlined (review r11:
            # hashing.md5_prefix_long's single-definition contract)
            md5_prefix_long(F.col("event_id").cast("string")) % 1_000_000
            < 500_000
        ).alias("is_cal"),
    )
    return conformal_threshold(
        ev, ["event_type"], "score", "is_cal", alpha_num=1, alpha_den=10
    ).orderBy("event_type")


C04_SQL = """
WITH scored AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS score,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 14))::BIGINT
           % 1000000 < 500000 AS is_cal
  FROM events
  WHERE value IS NOT NULL  -- matches the Spark side's NULL drop
),
cal AS (
  SELECT event_type, score,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY score
         ) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
  FROM scored WHERE is_cal
),
thresh AS (
  SELECT event_type, n_cal,
         least(n_cal, ((n_cal + 1) * 9 + 9) // 10) AS k_rank,
         ((n_cal + 1) * 9 + 9) // 10 > n_cal AS saturated,
         score AS q_hat
  FROM cal
  WHERE rk = least(n_cal, ((n_cal + 1) * 9 + 9) // 10)
),
cov AS (
  SELECT s.event_type, t.n_cal, t.k_rank, t.saturated, t.q_hat,
         CAST(count(*) AS BIGINT) AS n_eval,
         CAST(sum(CASE WHEN s.score <= t.q_hat THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered
  FROM scored s JOIN thresh t ON s.event_type = t.event_type
  WHERE NOT s.is_cal
  GROUP BY 1, 2, 3, 4, 5
)
SELECT event_type, n_cal, k_rank, saturated, q_hat, n_eval, n_covered,
       (n_covered * 1000000) // n_eval AS coverage_ppm
FROM cov
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# h05 — log₂-bucketed (exponential / DDSketch-style) histogram per
# event_type with p50/p99 bucket lower bounds: bounded RELATIVE error in
# ⌈log₂ max⌉ buckets, mergeable partials, bucket index computed exactly
# as length(bin(v)) in both engines (operators/quantiles.py).
# --------------------------------------------------------------------------
_H05_QS = [0.5, 0.99]


def h05_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", cents(F.col("value")).alias("c")
    )
    hist = qsk.log2_histogram(ev, ["event_type"], "c")
    return qsk.log2_histogram_quantiles(
        hist, ["event_type"], _H05_QS
    ).select("event_type", "q", "est_lo", "n_total").orderBy(
        "event_type", "q"
    )


H05_SQL = """
WITH v AS (
  SELECT event_type,
         greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 1) AS c
  FROM events
  WHERE value IS NOT NULL  -- matches log2_histogram's NULL drop
),
hist AS (
  SELECT event_type, CAST(length(bin(c)) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket,
         sum(cnt) OVER (
           PARTITION BY event_type ORDER BY bucket
         ) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_total
  FROM hist
),
qs AS (SELECT unnest([0.5, 0.99]) AS q)
SELECT event_type, q,
       CAST(pow(2, min(bucket) - 1) AS BIGINT) AS est_lo,
       min(n_total) AS n_total
FROM qs JOIN cum ON cum.cum >= (CAST(round(q * 1000000) AS BIGINT) * CAST(cum.n_total AS HUGEINT) + 999999) // 1000000
GROUP BY event_type, q
ORDER BY event_type, q
"""


# --------------------------------------------------------------------------
# q49 — TPC-H Q11 shape: share-of-total HAVING filter. The global total
# is a 1-row aggregate broadcast into the per-group HAVING — never a
# cross join of data; the share test stays rational (cross-multiplied
# integers), only the REPORTED share is rounded.
# --------------------------------------------------------------------------
# scale-free HAVING: keep suppliers whose share exceeds 1.05x the MEAN
# share (1/n_suppliers) — an absolute percent would empty out (or keep
# everything) as supplier cardinality grows with sf
_Q49_NUM, _Q49_DEN = 21, 20


def q49_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (cents(F.col("l_extendedprice")) * F.col("l_quantity").cast("bigint"))
        .alias("val_c"),
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum("val_c").alias("supp_val"))
    total = per_supp.agg(
        F.sum("supp_val").alias("total_val"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    dec = "decimal(38,0)"
    return (
        per_supp.crossJoin(F.broadcast(total))
        # DECIMAL(38,0) share test: supp_val·n_supp·20 passes int64 max
        # near sf 140 — non-ANSI Spark would wrap while DuckDB raised
        # (review r8; the pair_support/a05 overflow class)
        .where(
            F.col("supp_val").cast(dec) * F.col("n_supp") * _Q49_DEN
            > F.col("total_val").cast(dec) * _Q49_NUM
        )
        .select(
            "l_suppkey",
            "supp_val",
            F.round(F.col("supp_val") / F.col("total_val"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("supp_val"), "l_suppkey")
    )


Q49_SQL = f"""
WITH v AS (
  SELECT l_suppkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(l_quantity AS BIGINT) AS val_c
  FROM lineitem
),
per_supp AS (
  SELECT l_suppkey, CAST(sum(val_c) AS BIGINT) AS supp_val
  FROM v GROUP BY l_suppkey
),
total AS (SELECT CAST(sum(supp_val) AS BIGINT) AS total_val,
                 CAST(count(*) AS BIGINT) AS n_supp FROM per_supp)
SELECT l_suppkey, supp_val,
       round(CAST(supp_val AS DOUBLE) / total_val, 6) AS share
FROM per_supp, total
WHERE CAST(supp_val AS HUGEINT) * n_supp * {_Q49_DEN}
      > CAST(total_val AS HUGEINT) * {_Q49_NUM}
ORDER BY supp_val DESC, l_suppkey
"""


# --------------------------------------------------------------------------
# q50 — TPC-H Q14 shape: promo revenue share via conditional
# aggregation — one scan, two sums, ppm-floor report (never a float
# ratio in the hash).
# --------------------------------------------------------------------------
def q50_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey",
                                                cents(F.col("l_extendedprice")).alias("price_c"))
    part = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    # no broadcast hint (review r11: part grows linearly with sf and a
    # forced hint disables AQE's size fallback — the cohort_retention
    # r10 rule); AQE broadcasts it at runtime while it is actually small
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        F.sum(F.when(F.col("is_promo"), F.col("price_c")).otherwise(0))
        .alias("promo_c"),
        F.sum("price_c").alias("total_c"),
    ).select(
        "promo_c",
        "total_c",
        # DECIMAL promotion (review r11, the q49 pattern): promo_c*1e6
        # wraps int64 at roughly sf 3 — silent garbage on Spark, a
        # range error on DuckDB
        F.expr(
            "cast((cast(promo_c as decimal(38,0)) * 1000000)"
            " div total_c as bigint)"
        ).alias("promo_ppm"),
    )


Q50_SQL = """
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN c ELSE 0 END) AS BIGINT)
         AS promo_c,
       CAST(sum(c) AS BIGINT) AS total_c,
       CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN c ELSE 0 END)
                 AS HUGEINT)
         * 1000000 // CAST(sum(c) AS BIGINT) AS BIGINT) AS promo_ppm
FROM (
  SELECT l_partkey, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
) li
JOIN part ON p_partkey = l_partkey
"""


# --------------------------------------------------------------------------
# w03 — bottom-k sketch sample per language: the mergeable deterministic
# uniform sample (operators/sampling.py:bottomk_sample). Oracle replays
# the md5 order statistics directly.
# --------------------------------------------------------------------------
_W03_K = 5


def w03_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import bottomk_sample

    docs = load(spark, sf_dir, "documents").select("lang", "doc_id")
    return bottomk_sample(docs, ["lang"], "doc_id", _W03_K).select(
        "lang", "doc_id", "rank_in_group"
    ).orderBy("lang", "rank_in_group")


W03_SQL = f"""
SELECT lang, doc_id, rank_in_group FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('' || chr(1) || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rank_in_group
  FROM documents
) WHERE rank_in_group <= {_W03_K}
ORDER BY lang, rank_in_group
"""


# --------------------------------------------------------------------------
# q51 — TPC-H Q22 shape: customers above the average POSITIVE balance
# with no RECENT order (dormant high-value accounts), grouped by
# nation. The global average never materializes as a float: the
# comparison is cross-multiplied integers (bal·n_pos > sum_pos), and
# the 1-row (sum, count) aggregate broadcasts. Anti-join on the
# date-filtered orders is the J2 shape with pushdown (the recency
# predicate reaches the orders scan).
# --------------------------------------------------------------------------
_Q51_CUTOFF = "1998-01-01"


def q51_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", cents(F.col("c_acctbal")).alias("bal_c")
    )
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(_Q51_CUTOFF)
    ).select("o_custkey")
    pos = cust.where(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_pos"), F.count(F.lit(1)).alias("n_pos")
    )
    rich = (
        cust.crossJoin(F.broadcast(pos))
        .where(F.col("bal_c") * F.col("n_pos") > F.col("sum_pos"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("bal_c").alias("total_bal_c"),
    ).orderBy("c_nationkey")


Q51_SQL = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer
),
pos AS (
  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_pos,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM cust WHERE bal_c > 0
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(bal_c) AS BIGINT) AS total_bal_c
FROM cust, pos
WHERE bal_c * n_pos > sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= '1998-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --------------------------------------------------------------------------
# q52 — time-RANGE window frame: per-user rolling 1-hour sum at every
# event, RANGE BETWEEN INTERVAL — the time-based frame semantics (peers
# by timestamp, not row position) that ROWS frames can't express when
# events arrive unevenly. Integer cents sums; both engines include the
# full peer group in a RANGE frame.
# --------------------------------------------------------------------------
def q52_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents(F.col("value")).alias("c")
    )
    # selectExpr, not a temp view: createOrReplaceTempView mutates
    # session-global state (clobbers/races any same-named view) for a
    # frame expression that needs no SQL plumbing (review r8)
    return ev.selectExpr(
        "user_id",
        "event_id",
        "sum(c) OVER ("
        "  PARTITION BY user_id ORDER BY ts"
        "  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
        ") AS hour_sum_c",
    ).orderBy("user_id", "event_id")


Q52_SQL = """
SELECT user_id, event_id,
       CAST(sum(c) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS hour_sum_c
FROM (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
)
ORDER BY user_id, event_id
"""


# --------------------------------------------------------------------------
# w04 — KMV (bottom-k) distinct sketch SET OPERATIONS: union AND
# intersection cardinality estimates between every event-type pair from
# k=64 sketches of distinct user hashes — the set operation HLL cannot
# do (Beyer et al. synopses lineage; operators/sketches.py:kmv_sketch).
# exact_inter rides along so the artifact is estimate-vs-truth honest,
# like the r-family recall specs. All integer arithmetic: tau, (k-1)·2^56
# div tau, n_common·est div k — bit-replayable by the oracle.
# --------------------------------------------------------------------------
_W04_K = 64


def w04_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_pair_overlap, kmv_sketch

    ev = load(spark, sf_dir, "events")
    sk = kmv_sketch(ev, "event_type", "user_id", _W04_K)
    est = kmv_pair_overlap(sk, _W04_K)
    users = ev.select("event_type", "user_id").distinct()
    exact = (
        users.alias("ua")
        .join(
            users.alias("ub"),
            (F.col("ua.user_id") == F.col("ub.user_id"))
            & (F.col("ua.event_type") < F.col("ub.event_type")),
        )
        .groupBy(
            F.col("ua.event_type").alias("type_a"),
            F.col("ub.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    return (
        est.join(exact, ["type_a", "type_b"], "left")
        .fillna(0, subset=["exact_inter"])
        .orderBy("type_a", "type_b")
    )


W04_SQL = f"""
WITH eu AS (
  SELECT DISTINCT event_type AS g,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
sk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM eu
  ) WHERE rn <= {_W04_K}
),
gs AS (SELECT DISTINCT g FROM sk),
pr AS (SELECT x.g AS ta, y.g AS tb FROM gs x, gs y WHERE x.g < y.g),
mem AS (
  SELECT p.ta, p.tb, s.h,
         max(CASE WHEN s.g = p.ta THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.g = p.tb THEN 1 ELSE 0 END) AS in_b
  FROM pr p JOIN sk s ON s.g IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY ta, tb) AS n_union
  FROM mem
),
agg AS (
  SELECT ta, tb,
         max(CASE WHEN rn = LEAST({_W04_K}, n_union) THEN h END) AS tau,
         CAST(sum(CASE WHEN rn <= {_W04_K} AND in_a = 1 AND in_b = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         max(n_union) AS n_union
  FROM rk GROUP BY 1, 2
),
est AS (
  SELECT ta, tb, tau, n_common,
         CAST(CASE WHEN n_union >= {_W04_K}
              THEN {(_W04_K - 1) * (1 << 56)} // tau
              ELSE n_union END AS BIGINT) AS est_union,
         n_union
  FROM agg
),
ex AS (
  SELECT ua.event_type AS ta, ub.event_type AS tb,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM (SELECT DISTINCT event_type, user_id FROM events) ua
  JOIN (SELECT DISTINCT event_type, user_id FROM events) ub
    ON ua.user_id = ub.user_id AND ua.event_type < ub.event_type
  GROUP BY 1, 2
)
SELECT e.ta AS type_a, e.tb AS type_b, e.tau, e.n_common, e.est_union,
       CAST(CASE WHEN e.n_union >= {_W04_K}
            THEN (e.n_common::HUGEINT * e.est_union) // {_W04_K}
            ELSE e.n_common END AS BIGINT) AS est_inter,
       coalesce(x.exact_inter, 0) AS exact_inter
FROM est e LEFT JOIN ex x ON x.ta = e.ta AND x.tb = e.tb
ORDER BY type_a, type_b
"""


# --------------------------------------------------------------------------
# u07 — incremental JOIN-view maintenance by delta decomposition
# (operators/incremental.py:merge_join_view): the maintained
# history⋈history view plus three delta joins equals the full join the
# oracle computes from scratch. Splits: orders by date (append-only
# fact deltas), customers by key mod (late-arriving dim rows) — the
# worst case where BOTH sides grew.
# --------------------------------------------------------------------------
_U07_SPLIT = "1997-01-01"


def u07_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import merge_join_view

    a = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"),
        cents(F.col("o_totalprice")).alias("total_cents"), "o_orderdate",
    )
    b = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name",
    )
    # NULL-exhaustive splits (review r11, the u06 rule): a NULL date or
    # NULL key fails both sides of a </>= or !=/== pair and would
    # vanish from the maintained view while the oracle's plain join
    # keeps it
    a_is_new = F.coalesce(F.col("o_orderdate") >= _U07_SPLIT, F.lit(False))
    b_is_new = F.coalesce(F.col("custkey") % 10 == 0, F.lit(False))
    a_hist = a.where(~a_is_new)
    a_new = a.where(a_is_new)
    b_hist = b.where(~b_is_new)
    b_new = b.where(b_is_new)
    view = a_hist.join(b_hist, ["custkey"])   # the materialized state
    out = merge_join_view(view, a_hist, a_new, b_hist, b_new, ["custkey"])
    return out.select("o_orderkey", "custkey", "c_name", "total_cents")


U07_SQL = """
SELECT o_orderkey, o_custkey AS custkey, c_name,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
"""


SPECS = [
    QuerySpec("u06_incremental_agg_view", u06_incremental_agg_view, U06_SQL,
              "materialized-view maintenance by monoid partial merge — "
              "batch folded into the view without rescanning history; "
              "oracle is the full recompute"),
    QuerySpec("z03_bloom_point_lookup", z03_bloom_point_lookup, Z03_SQL,
              "per-file bloom index replay: point-lookup pruning where "
              "min/max stats cannot prune (probe uncorrelated with "
              "layout); real on-disk API pytest-verified"),
    QuerySpec("y01_skyline_parts", y01_skyline_parts, Y01_SQL,
              "distributed 2-D Pareto skyline via bucketed prefix-max "
              "scan (sort+window, never the quadratic join); oracle "
              "replays NOT-EXISTS dominance"),
    QuerySpec("g02_ewma_user_value", g02_ewma_user_value, G02_SQL,
              "dyadic-exact EWMA (alpha=1/2, 16 lags) per user — the "
              "one EWMA whose arithmetic hash-matches across engines"),
    QuerySpec("c04_conformal_threshold", c04_conformal_threshold, C04_SQL,
              "split-conformal prediction threshold per group: exact "
              "integer order-statistic rank + ppm coverage"),
    QuerySpec("h05_log2_histogram", h05_log2_histogram, H05_SQL,
              "exponential (log2-bucket) histogram quantiles — bounded "
              "relative error, mergeable, bucket = length(bin(v))"),
    QuerySpec("q49_supplier_share", q49_supplier_share, Q49_SQL,
              "TPC-H Q11 shape: share-of-total HAVING via broadcast "
              "1-row total + rational cross-multiplied threshold"),
    QuerySpec("q50_promo_share", q50_promo_share, Q50_SQL,
              "TPC-H Q14 shape: conditional-aggregation revenue share, "
              "broadcast dim join, ppm-floor report"),
    QuerySpec("w03_bottomk_sample", w03_bottomk_sample, W03_SQL,
              "bottom-k sketch sample per stratum: mergeable, "
              "deterministic, retry-stable (md5 order statistics)"),
    QuerySpec("q51_sales_opportunity", q51_sales_opportunity, Q51_SQL,
              "TPC-H Q22 shape: above-average-balance anti-join, "
              "cross-multiplied average, broadcast 1-row aggregate"),
    QuerySpec("q52_time_range_window", q52_time_range_window, Q52_SQL,
              "time-RANGE window frame (INTERVAL 1 HOUR PRECEDING): "
              "per-user rolling sum with timestamp-peer semantics"),
    QuerySpec("w04_kmv_overlap", w04_kmv_overlap, W04_SQL,
              "KMV bottom-k sketch set operations: union + intersection "
              "distinct estimates per group pair, with exact truth column"),
    QuerySpec("u07_incremental_join_view", u07_incremental_join_view, U07_SQL,
              "incremental join-view maintenance: view + three delta "
              "joins == full recompute (history never rejoined)"),
]
