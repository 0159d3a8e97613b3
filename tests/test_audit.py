"""Mergeable table fingerprints (operators/audit.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import audit


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in rows], "k string, a long, b string"
    )


def test_fingerprint_order_insensitive(spark):
    rows = [("x", 1, "p"), ("x", 2, "q"), ("y", 3, "r")]
    d1 = _df(spark, rows)
    d2 = _df(spark, list(reversed(rows))).repartition(5)
    a = audit.table_fingerprint(d1).collect()[0]
    b = audit.table_fingerprint(d2).collect()[0]
    assert (a["n_rows"], a["fingerprint"]) == (b["n_rows"], b["fingerprint"])


def test_fingerprint_detects_single_cell_change(spark):
    base = audit.table_fingerprint(
        _df(spark, [("x", 1, "p"), ("y", 2, "q")])
    ).collect()[0]
    tweak = audit.table_fingerprint(
        _df(spark, [("x", 1, "p"), ("y", 2, "Q")])
    ).collect()[0]
    assert base["n_rows"] == tweak["n_rows"]
    assert base["fingerprint"] != tweak["fingerprint"]


def test_fingerprint_shard_merge_equals_direct(spark):
    rows = [(f"k{i % 3}", i, f"v{i}") for i in range(50)]
    df = _df(spark, rows)
    direct = {
        r["k"]: (r["n_rows"], r["fingerprint"])
        for r in audit.table_fingerprint(df, group_by=["k"]).collect()
    }
    sharded = audit.table_fingerprint(
        df.withColumn("_s", F.pmod(F.col("a"), F.lit(4))),
        columns=["a", "b"],
        group_by=["k", "_s"],
    )
    merged = {
        r["k"]: (r["n_rows"], r["fingerprint"])
        for r in audit.merge_fingerprints(sharded, ["k"]).collect()
    }
    # columns=["a","b"] matches the group_by-excluded default of direct
    assert direct == merged


def test_fingerprint_group_keys_excluded_from_hash_by_default(spark):
    # same (a, b) payloads under different keys -> same per-group prints
    d = _df(spark, [("x", 1, "p"), ("y", 1, "p")])
    out = {r["k"]: r["fingerprint"]
           for r in audit.table_fingerprint(d, group_by=["k"]).collect()}
    assert out["x"] == out["y"]
