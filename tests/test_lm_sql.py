"""Hashed bigram-LM scoring + SQL temp-view facade."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import lm
from datawarehouse_backup_system_spark.sql import register_tables


def test_bigram_lm_ranks_typical_above_garbled(spark):
    common = "the cat sat on the mat and the cat ran"
    rows = [(i, common) for i in range(10)] + [
        (100, "zq xv jk wq pv zz qx vj kw qp"),  # bigrams seen nowhere else
        (200, "one"),  # <2 tokens → no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm.bigram_lm_scores(df, "doc_id", "text").collect()}
    assert out[0]["avg_logp"] > out[100]["avg_logp"]  # typical beats garbled
    assert out[200]["n_bigrams"] == 0
    assert out[200]["avg_logp"] is None and out[200]["sum_logp"] == 0.0
    assert out[0]["n_bigrams"] == 9  # 10 tokens → 9 bigrams


def test_bigram_lm_partition_order_independent(spark):
    rows = [(i, f"alpha beta gamma delta tok{i % 5} beta alpha") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["sum_logp"]
         for r in lm.bigram_lm_scores(df, "doc_id", "text").collect()}
    b = {r["doc_id"]: r["sum_logp"]
         for r in lm.bigram_lm_scores(df.repartition(7, "doc_id"), "doc_id", "text").collect()}
    assert a == b  # decimal-summed: bit-identical under any partitioning


def test_register_tables_sql_matches_dataframe(spark, sf_dir):
    names = register_tables(spark, sf_dir)
    assert set(names) >= {"documents", "events", "orders"}
    via_sql = spark.sql(
        "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"
    ).collect()
    via_df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sorted(map(tuple, via_sql)) == sorted(map(tuple, via_df))
    # events view carries the normalized ts (timestamp, not raw int64)
    t = spark.sql("SELECT ts FROM events").schema["ts"].dataType.typeName()
    assert t == "timestamp"


def test_register_tables_prefix(spark, sf_dir):
    names = register_tables(spark, sf_dir, prefix="x_")
    assert "x_documents" in names
    assert spark.sql("SELECT COUNT(*) AS n FROM x_region").collect()[0]["n"] > 0
