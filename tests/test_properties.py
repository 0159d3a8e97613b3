"""Property-based invariants (SURVEY §5): dedup idempotence, anti-join
disjointness, dense-id correctness under arbitrary partitioning."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators.dedup import (
    anti_join_history,
    self_dedup_first,
)
from datawarehouse_backup_system_spark.operators.hashing import with_row_hash
from datawarehouse_backup_system_spark.operators.ids import assign_dense_ids

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

content = st.lists(
    st.tuples(st.integers(0, 9), st.sampled_from(["a", "b", "c", None])),
    min_size=0,
    max_size=30,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, v, s) for i, (v, s) in enumerate(rows)], "seq long, v long, s string"
    )


@SETTINGS
@given(rows=content)
def test_dedup_idempotent_and_first_wins(spark, rows):
    df = with_row_hash(_df(spark, rows), ["v", "s"])
    once = self_dedup_first(df, order_col="seq")
    twice = self_dedup_first(once, order_col="seq")
    got_once = sorted(r["seq"] for r in once.collect())
    got_twice = sorted(r["seq"] for r in twice.collect())
    assert got_once == got_twice  # idempotence
    # first occurrence wins: survivor seq is the min seq of its group
    first_by_key = {}
    for i, (v, s) in enumerate(rows):
        first_by_key.setdefault((v, s), i)
    assert got_once == sorted(first_by_key.values())


@SETTINGS
@given(rows=content, hist=content)
def test_anti_join_disjoint_and_complete(spark, rows, hist):
    new = with_row_hash(_df(spark, rows), ["v", "s"])
    history = with_row_hash(_df(spark, hist), ["v", "s"])
    out = anti_join_history(new, history)
    hist_keys = {(v, s) for (v, s) in hist}
    surviving = {(r["v"], r["s"]) for r in out.collect()}
    assert surviving.isdisjoint(hist_keys)  # nothing from history leaks
    expected = {(v, s) for (v, s) in rows} - hist_keys
    assert surviving == expected  # nothing novel is lost


@SETTINGS
@given(
    n=st.integers(0, 200),
    start=st.integers(0, 10_000),
    parts=st.integers(1, 8),
)
def test_dense_ids_any_partitioning(spark, n, start, parts):
    df = spark.range(n).withColumnRenamed("id", "k").repartition(parts)
    out = assign_dense_ids(df, ["k"], start=start, num_partitions=parts)
    rows = out.orderBy("k").select("id").collect()
    assert [r["id"] for r in rows] == list(range(start + 1, start + n + 1))
