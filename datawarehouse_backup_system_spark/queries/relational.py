"""Relational parity queries (SURVEY §2.2-§2.7) over the TPC-H-ish fixtures.

Each query re-expresses a reference operator family as idiomatic Spark —
filters/aggregates/anti-joins/windows — with a DuckDB oracle. Citations in
each docstring point at the reference code whose semantics the query
checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators.cast import (
    parse_timestamp,
    scrub_nulls,
    strip_trailing_dot_zero,
)
from datawarehouse_backup_system_spark.operators.hashing import (
    HASH_SEP,
    row_hash_col,
)
from datawarehouse_backup_system_spark.queries.base import QuerySpec, load


def cents(col: Column, scale: int = 100) -> Column:
    """Exact engine-portable fixed-point: floor(x*scale + 0.5) is a pure
    IEEE-754 double pipeline, bit-identical in Spark and DuckDB (unlike
    ROUND(double, n) / CAST(double AS DECIMAL), whose half-up tie handling
    is implementation-defined). Summing the resulting BIGINTs is exact."""
    return F.floor(col * scale + F.lit(0.5)).cast("bigint")


# --------------------------------------------------------------------------
# q01 — flagship: TPC-H-Q1-style pricing summary (A1/A5 aggregate family)
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(cents(disc)) / 100.0).alias("sum_disc_price"),
            (F.sum(cents(charge)) / 100.0).alias("sum_charge"),
            (F.sum(cents(F.col("l_quantity"))) / (100.0 * n)).alias("avg_qty"),
            (F.sum(cents(F.col("l_extendedprice"))) / (100.0 * n)).alias("avg_price"),
            (F.sum(cents(F.col("l_discount"), 10_000)) / (10_000.0 * n)).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_charge,
       SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / (100.0 * COUNT(*)) AS avg_qty,
       SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / (100.0 * COUNT(*)) AS avg_price,
       SUM(CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) / (10000.0 * COUNT(*)) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — scan/filter/projection with parquet pushdown (P4; SURVEY §4)
# --------------------------------------------------------------------------
def q02_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_returnflag") == "R")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


Q02_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
"""


# --------------------------------------------------------------------------
# q03 — id-range probe, predicate pushed to row-group stats
# (reference P5: data_pushing.py:144-147)
# --------------------------------------------------------------------------
def q03_id_range_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey").between(1000, 2000))
        .select("o_orderkey")
    )


Q03_SQL = "SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000"


# --------------------------------------------------------------------------
# q04 — replay guard: anti-join batch ids vs existing ids
# (reference J3: data_pushing.py:115-166)
# --------------------------------------------------------------------------
def q04_replay_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    batch = orders.where(F.col("o_orderkey") <= 5000)
    existing = orders.where(F.col("o_totalprice") > 200000).select("o_orderkey")
    return batch.join(existing, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


Q04_SQL = """
SELECT o_orderkey, o_orderstatus
FROM orders b
WHERE o_orderkey <= 5000
  AND NOT EXISTS (
    SELECT 1 FROM orders e
    WHERE e.o_totalprice > 200000 AND e.o_orderkey = b.o_orderkey
  )
"""


# --------------------------------------------------------------------------
# q05 — order-defined first-occurrence self-dedup
# (reference J1: data_processing.py:396-524; SURVEY D2/D3)
# --------------------------------------------------------------------------
def q05_self_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    hash_cols = ["l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    # THE canonical null-safe content key, imported not inlined
    # (review r11: q05 copied row_hash_col's body while q06/q08 drifted
    # into NULL-blind variants — the divergence the helper exists to
    # prevent)
    hashed = li.withColumn("row_hash", row_hash_col(hash_cols))
    w = Window.partitionBy("row_hash").orderBy("l_orderkey", "l_linenumber")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("l_orderkey", "l_linenumber", "row_hash")
    )


Q05_SQL = """
WITH hashed AS (
  SELECT l_orderkey, l_linenumber,
         md5(concat_ws(chr(1),
             coalesce(CAST(l_partkey AS VARCHAR), '<NULL>'),
             coalesce(CAST(l_suppkey AS VARCHAR), '<NULL>'),
             coalesce(l_returnflag, '<NULL>'),
             coalesce(l_linestatus, '<NULL>'))) AS row_hash
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, row_hash
FROM (
  SELECT *, row_number() OVER (PARTITION BY row_hash
                               ORDER BY l_orderkey, l_linenumber) AS rn
  FROM hashed
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q06 — cross-batch incremental dedup: anti-join vs history
# (reference J2: data_processing.py:209-393, driver loop main.py:221-248)
# --------------------------------------------------------------------------
def q06_crossfile_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # null-safe canonical key (review r11: the NULL-blind concat_ws let
    # (NULL, 'x') collide with ('x', NULL) on BOTH engines — incoming
    # rows falsely dropped as replay duplicates, oracle-blind; latent
    # on the NULL-free fixtures)
    hashed = ev.withColumn(
        "row_hash", row_hash_col(["user_id", "event_type", "props"])
    )
    history = hashed.where(F.col("event_id") < 5000).select("row_hash").distinct()
    incoming = hashed.where(F.col("event_id") >= 5000)
    return incoming.join(history, "row_hash", "left_anti").select(
        "event_id", "user_id", "event_type"
    )


Q06_SQL = """
WITH hashed AS (
  SELECT *, md5(concat_ws(chr(1),
             coalesce(CAST(user_id AS VARCHAR), '<NULL>'),
             coalesce(event_type, '<NULL>'),
             coalesce(props, '<NULL>'))) AS row_hash
  FROM events
)
SELECT event_id, user_id, event_type
FROM hashed i
WHERE event_id >= 5000
  AND NOT EXISTS (
    SELECT 1 FROM hashed h WHERE h.event_id < 5000 AND h.row_hash = i.row_hash
  )
"""


# --------------------------------------------------------------------------
# q07 — watermark: MAX(id) + COUNT(*) pushed to parquet metadata
# (reference A1/A2: data_pushing.py:136,419)
# --------------------------------------------------------------------------
def q07_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").agg(
        F.max("o_orderkey").alias("last_id"), F.count("*").alias("n_rows")
    )


Q07_SQL = "SELECT MAX(o_orderkey) AS last_id, COUNT(*) AS n_rows FROM orders"


# --------------------------------------------------------------------------
# q08 — distinct-set build (reference A3: hash-set of row hashes)
# --------------------------------------------------------------------------
def q08_distinct_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load(spark, sf_dir, "customer")
    # null-safe canonical key (review r11, same class as q06)
    h = row_hash_col(["c_name", "c_mktsegment", "c_nationkey"])
    return cu.select(h.alias("row_hash")).agg(
        F.countDistinct("row_hash").alias("n_distinct")
    )


Q08_SQL = """
SELECT COUNT(DISTINCT md5(concat_ws(chr(1),
           coalesce(c_name, '<NULL>'),
           coalesce(c_mktsegment, '<NULL>'),
           coalesce(CAST(c_nationkey AS VARCHAR), '<NULL>')))) AS n_distinct
FROM customer
"""


# --------------------------------------------------------------------------
# q09 — mode / top-1 by count (reference A4: delimiter sniff Counter)
# --------------------------------------------------------------------------
def q09_mode_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(1)
    )


Q09_SQL = """
SELECT event_type, COUNT(*) AS n
FROM events GROUP BY event_type
ORDER BY n DESC, event_type ASC LIMIT 1
"""


# --------------------------------------------------------------------------
# q10 — size-capped eviction: oldest-first running sum until ≤90% of total
# (reference O1/O2/C3: cleanup.py:81-128)
# --------------------------------------------------------------------------
def q10_retention_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("size_b", cents(F.col("value")))
    w_before = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # grand total as a broadcast 1-row aggregate (review r11): the old
    # Window.partitionBy() funneled the whole table through a SECOND
    # single-partition pass just for one scalar. The running-sum window
    # below stays — oldest-first eviction is an order-DEFINED
    # semantics, and the production operator (operators/retention.py)
    # runs it over metadata-sized file listings, not data rows.
    total = ev.agg(F.sum("size_b").alias("total"))
    sized = ev.withColumn(
        "before_me", F.coalesce(F.sum("size_b").over(w_before), F.lit(0))
    ).crossJoin(F.broadcast(total))
    # delete oldest while remaining > 90% of original total
    return sized.where(F.col("before_me") * 10 < F.col("total")).select(
        "event_id", "size_b"
    )


Q10_SQL = """
WITH sized AS (
  SELECT event_id, ts, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS size_b FROM events
), cum AS (
  SELECT event_id, size_b,
         COALESCE(SUM(size_b) OVER (ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_me,
         SUM(size_b) OVER () AS total
  FROM sized
)
SELECT event_id, size_b FROM cum WHERE before_me * 10 < total
"""


# --------------------------------------------------------------------------
# q11 — scalar cleaning battery (F2-F7) over deterministically-dirtied rows
# (reference data_pushing.py:341-372, 20-50)
# --------------------------------------------------------------------------
def q11_scalar_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        F.concat(F.col("user_id").cast("string"), F.lit("234567.0")).alias("raw_mobile"),
        F.when(F.col("event_id") % 7 == 0, F.lit("two"))
        .when(F.col("event_id") % 11 == 0, F.lit(""))
        .otherwise((F.col("event_id") % 5).cast("string"))
        .alias("raw_count"),
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "dd/MM/yyyy HH:mm"))
        .otherwise(F.lit("31/31/2024"))
        .alias("raw_ts"),
        F.when(F.col("event_id") % 13 == 0, F.lit("nan"))
        .when(F.col("event_id") % 17 == 0, F.lit("<NA>"))
        .otherwise(F.col("event_type"))
        .alias("raw_type"),
    )
    return dirty.select(
        "event_id",
        strip_trailing_dot_zero(F.col("raw_mobile")).alias("mobile"),
        scrub_nulls(F.col("raw_count")).try_cast("bigint").alias("n_children"),
        parse_timestamp(
            F.col("raw_ts"), (None, "dd/MM/yyyy HH:mm")
        ).alias("parsed_ts"),
        scrub_nulls(F.col("raw_type")).alias("clean_type"),
    )


Q11_SQL = """
WITH dirty AS (
  SELECT event_id,
    CAST(user_id AS VARCHAR) || '234567.0' AS raw_mobile,
    CASE WHEN event_id % 7 = 0 THEN 'two'
         WHEN event_id % 11 = 0 THEN ''
         ELSE CAST(event_id % 5 AS VARCHAR) END AS raw_count,
    CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
         WHEN event_id % 3 = 1 THEN strftime(ts, '%d/%m/%Y %H:%M')
         ELSE '31/31/2024' END AS raw_ts,
    CASE WHEN event_id % 13 = 0 THEN 'nan'
         WHEN event_id % 17 = 0 THEN '<NA>'
         ELSE event_type END AS raw_type
  FROM events
)
SELECT event_id,
  regexp_replace(raw_mobile, '\\.0$', '') AS mobile,
  TRY_CAST(CASE WHEN trim(raw_count) IN ('<NA>','nan','') THEN NULL
                ELSE raw_count END AS BIGINT) AS n_children,
  COALESCE(try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S'),
           try_strptime(raw_ts, '%d/%m/%Y %H:%M')) AS parsed_ts,
  CASE WHEN trim(raw_type) IN ('<NA>','nan','') THEN NULL
       ELSE raw_type END AS clean_type
FROM dirty
"""


# --------------------------------------------------------------------------
# q12 — add-missing-column projection (reference P2: main.py:178-195)
# --------------------------------------------------------------------------
def q12_add_missing_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.lit(None).cast("string").alias("smtp_response"),
        "source",
    )


Q12_SQL = """
SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS smtp_response, source
FROM documents
"""


# --------------------------------------------------------------------------
# q13 — deterministic top-k (O-family sort/limit)
# --------------------------------------------------------------------------
def q13_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


Q13_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# q14 — multiway join + grouped revenue (the relational surface Spark adds;
# dims broadcast, fact shuffled once)
# --------------------------------------------------------------------------
def q14_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    lineitem = load(spark, sf_dir, "lineitem")
    revenue = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            (F.sum(revenue) / 100.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q14_SQL = """
SELECT r_name,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# q15 — semi-join (EXISTS): customers having recent urgent orders
# --------------------------------------------------------------------------
def q15_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


Q15_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderpriority = '1-URGENT' AND o.o_custkey = c.c_custkey)
"""


# --------------------------------------------------------------------------
# q16 — per-key running total (window F8-analog; integer-cent exact)
# --------------------------------------------------------------------------
def q16_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("cents", cents(F.col("value")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", "user_id", F.sum("cents").over(w).alias("running_cents")
    )


Q16_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_cents
FROM events
"""


# --------------------------------------------------------------------------
# q17 — sessionization: lag-gap > 30 min starts a new session
# --------------------------------------------------------------------------
def q17_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
    )


Q17_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q18 — grouped profile stats (min/max exact doubles, distinct counts)
# --------------------------------------------------------------------------
def q18_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


Q18_SQL = """
SELECT event_type, COUNT(*) AS n, MIN(value) AS min_value,
       MAX(value) AS max_value, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q19 — tumbling 10-minute window aggregation (streaming analog, batch form)
# --------------------------------------------------------------------------
def q19_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucketed = ev.groupBy(
        F.window("ts", "10 minutes").alias("w"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )
    return bucketed.select(
        F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
        "event_type",
        "n",
        "sum_cents",
    )


Q19_SQL = """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS bucket_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q20 — sliding windows (10 min window, 5 min slide): each event lands in 2
# --------------------------------------------------------------------------
def q20_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("bucket_start"), "n")
    )


Q20_SQL = """
WITH starts AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS w1 FROM events
  UNION ALL
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - 300 FROM events
)
SELECT w1 AS bucket_start, COUNT(*) AS n FROM starts GROUP BY 1
"""


# --------------------------------------------------------------------------
# q21 — cardinality profile (exact; approx_count_distinct lives in bench)
# --------------------------------------------------------------------------
def q21_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_rows"),
    )


Q21_SQL = """
SELECT COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT event_type) AS n_types,
       COUNT(*) AS n_rows
FROM events
"""


SPECS: list[QuerySpec] = [
    QuerySpec("q01_pricing_summary", q01_pricing_summary, Q01_SQL,
              "TPC-H Q1-style aggregate battery (A1/A5)"),
    QuerySpec("q02_scan_filter_project", q02_scan_filter_project, Q02_SQL,
              "filter+projection with parquet pushdown (P4)"),
    QuerySpec("q03_id_range_probe", q03_id_range_probe, Q03_SQL,
              "id-range probe (P5, data_pushing.py:144-147)"),
    QuerySpec("q04_replay_anti_join", q04_replay_anti_join, Q04_SQL,
              "anti-join replay guard (J3)"),
    QuerySpec("q05_self_dedup_first", q05_self_dedup_first, Q05_SQL,
              "order-defined first-occurrence dedup (J1)"),
    QuerySpec("q06_crossfile_dedup", q06_crossfile_dedup, Q06_SQL,
              "incremental anti-join dedup vs history (J2)"),
    QuerySpec("q07_watermark", q07_watermark, Q07_SQL, "MAX(id)/COUNT(*) (A1/A2)"),
    QuerySpec("q08_distinct_hashes", q08_distinct_hashes, Q08_SQL,
              "distinct hash-set cardinality (A3)"),
    QuerySpec("q09_mode_top1", q09_mode_top1, Q09_SQL, "mode/top-1 count (A4)"),
    QuerySpec("q10_retention_eviction", q10_retention_eviction, Q10_SQL,
              "oldest-first size-capped eviction (O1/O2/C3)"),
    QuerySpec("q11_scalar_cleaning", q11_scalar_cleaning, Q11_SQL,
              "scalar cleaning battery F2-F7"),
    QuerySpec("q12_add_missing_column", q12_add_missing_column, Q12_SQL,
              "add-missing-column projection (P2)"),
    QuerySpec("q13_topk_orders", q13_topk_orders, Q13_SQL, "deterministic top-k"),
    QuerySpec("q14_revenue_by_region", q14_revenue_by_region, Q14_SQL,
              "multiway broadcast join + grouped revenue"),
    QuerySpec("q15_semi_join", q15_semi_join, Q15_SQL, "EXISTS semi-join"),
    QuerySpec("q16_running_total", q16_running_total, Q16_SQL,
              "per-key running total window"),
    QuerySpec("q17_sessionize", q17_sessionize, Q17_SQL, "lag-gap sessionization"),
    QuerySpec("q18_group_stats", q18_group_stats, Q18_SQL, "grouped profile stats"),
    QuerySpec("q19_tumbling_window", q19_tumbling_window, Q19_SQL,
              "tumbling 10-min window agg"),
    QuerySpec("q20_sliding_window", q20_sliding_window, Q20_SQL,
              "sliding 10/5-min window counts"),
    QuerySpec("q21_cardinality_profile", q21_cardinality_profile, Q21_SQL,
              "exact cardinality profile"),
]


# --------------------------------------------------------------------------
# r7 consolidation (COVERAGE.md plan): near-duplicate specs folded OUT of
# the driver contract to cut full re-attestation latency; the functions and
# oracle SQL stay, and tests/test_folded_twins.py re-runs the exact
# spark-vs-DuckDB comparison per commit. Keepers:
#   q02 -> q03 (pushdown probe; ReadSchema assert in test_plan_contracts)
#   q13 -> q22 (top-k; tiebreak pinned in test_folded_twins)
#   q16 -> q39 (cumulative window frame)
#   q17 -> q43 (sessionization; gap-boundary pinned in test_folded_twins)
#   q19 -> q20 (tumbling == sliding with stride==width, pinned in tests)
#   q21 -> q30 (cardinality profile; q30 carries exact+approx columns)
# --------------------------------------------------------------------------
_FOLDED = {
    "q02_scan_filter_project", "q13_topk_orders", "q16_running_total",
    "q17_sessionize", "q19_tumbling_window", "q21_cardinality_profile",
}
FOLDED_SPECS = [s for s in SPECS if s.name in _FOLDED]
SPECS = [s for s in SPECS if s.name not in _FOLDED]
