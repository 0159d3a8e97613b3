"""Tests for MERGE-emulation / SCD2 / compaction operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators.upsert import (
    compact_partition,
    merge_upsert,
    scd2_apply,
)


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "NEW2"), (4, "NEW4")], "k long, v string")
    out = {(r["k"], r["v"]) for r in merge_upsert(target, updates, "k").collect()}
    assert out == {(1, "old1"), (2, "NEW2"), (3, "old3"), (4, "NEW4")}


def test_merge_upsert_duplicate_updates_last_write_wins(spark):
    target = spark.createDataFrame([(1, "old", 0)], "k long, v string, ts long")
    updates = spark.createDataFrame(
        [(1, "mid", 5), (1, "last", 9), (2, "x", 1)], "k long, v string, ts long"
    )
    out = {(r["k"], r["v"]) for r in merge_upsert(target, updates, "k", order_col="ts").collect()}
    assert out == {(1, "last"), (2, "x")}


def test_scd2_multiple_changes_same_key_chain(spark):
    t0, t1, t2 = (dt.datetime(2024, m, 1) for m in (1, 6, 9))
    dim = spark.createDataFrame(
        [(1, "v0", t0, None)],
        "k long, email string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "v1", t1), (1, "v2", t2)], "k long, email string, _change_ts timestamp"
    )
    out = scd2_apply(dim, changes, "k").collect()
    rows = {(r["email"], r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {("v0", t0, t1), ("v1", t1, t2), ("v2", t2, None)}
    assert sum(1 for r in out if r["valid_to"] is None) == 1  # one open row


def test_scd2_apply(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "alice@a", t0, None),     # open
            (2, "bob@b", t0, None),       # open, unchanged
            (1, "alice@old", dt.datetime(2023, 1, 1), t0),  # history
        ],
        "k long, email string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "alice@new", t1)], "k long, email string, _change_ts timestamp"
    )
    out = scd2_apply(dim, changes, "k").collect()
    rows = {(r["k"], r["email"], r["valid_to"]) for r in out}
    assert (1, "alice@a", t1) in rows          # closed at change ts
    assert (1, "alice@new", None) in rows      # new open version
    assert (2, "bob@b", None) in rows          # untouched open row
    assert (1, "alice@old", t0) in rows        # history preserved
    assert len(out) == 4
    # exactly one open row per key
    open_counts = {}
    for r in out:
        if r["valid_to"] is None:
            open_counts[r["k"]] = open_counts.get(r["k"], 0) + 1
    assert open_counts == {1: 1, 2: 1}


def test_compact_partition(spark, tmp_path):
    table = tmp_path / "t"
    df = spark.range(100).withColumn("ingest_date", F.lit("2024-01-05"))
    # many small appends -> many files
    for _ in range(4):
        df.coalesce(2).write.mode("append").partitionBy("ingest_date").parquet(str(table))
    part = "ingest_date=2024-01-05"
    before = len(list((table / part).glob("*.parquet")))
    assert before >= 8
    reported = compact_partition(spark, table, part, target_files=1)
    assert reported == before
    after = list((table / part).glob("*.parquet"))
    assert len(after) == 1
    assert spark.read.parquet(str(table)).count() == 400
    # idempotent: already compact -> no-op
    assert compact_partition(spark, table, part, target_files=1) == 1
    # staging/backup dirs never leak into table-root reads
    assert not list(table.glob("_compact*"))

    # nonexistent partition raises instead of silently no-opping
    import pytest

    with pytest.raises(FileNotFoundError):
        compact_partition(spark, table, "ingest_date=2024-1-5")

    # crash recovery: a leftover backup with no live dir is restored
    (table / part).rename(table / f"_compact_backup_{part}")
    assert compact_partition(spark, table, part, target_files=1) == 1
    assert spark.read.parquet(str(table)).count() == 400


def test_delete_where_rewrites_only_affected_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from datawarehouse_backup_system_spark.operators.upsert import (
        delete_where,
    )

    table = tmp_path / "snap"
    rows = [(i, i % 3, f"d{i % 2}") for i in range(60)]
    spark.createDataFrame(rows, "id long, user long, ingest_date string") \
        .repartition(4).write.partitionBy("ingest_date").parquet(str(table))
    untouched_files = {
        p.name for p in (table / "ingest_date=d1").glob("*.parquet")
    }

    # delete user 1 only from partition d0
    n = delete_where(
        spark, table, (F.col("user") == 1) & (F.col("ingest_date") == "d0")
    )
    left = spark.read.parquet(str(table))
    assert n == len([r for r in rows if r[1] == 1 and r[2] == "d0"])
    assert left.where((F.col("user") == 1) & (F.col("ingest_date") == "d0")).count() == 0
    # everything else intact, untouched partition byte-identical files
    assert left.count() == 60 - n
    assert {
        p.name for p in (table / "ingest_date=d1").glob("*.parquet")
    } == untouched_files
    # idempotent: re-running deletes nothing
    assert delete_where(
        spark, table, (F.col("user") == 1) & (F.col("ingest_date") == "d0")
    ) == 0
