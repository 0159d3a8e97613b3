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


def test_bigram_model_merge_equals_union(spark):
    a = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 3} gamma") for i in range(15)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(100 + i, f"beta gamma tok{i % 4} delta") for i in range(15)],
        "doc_id long, text string",
    )
    union = a.unionByName(b)
    probe = spark.createDataFrame(
        [(999, "alpha beta gamma delta zzz")], "doc_id long, text string"
    )
    direct = lm.score_with_model(
        probe, "doc_id", "text", lm.bigram_model(union, "doc_id", "text")
    ).collect()[0]
    merged = lm.score_with_model(
        probe, "doc_id", "text",
        lm.merge_models(
            lm.bigram_model(a, "doc_id", "text"),
            lm.bigram_model(b, "doc_id", "text"),
        ),
    ).collect()[0]
    assert direct["sum_logp"] == merged["sum_logp"]  # bit-identical
    assert direct["n_bigrams"] == merged["n_bigrams"]


def test_score_disjoint_corpus_unseen_bigrams_floor(spark):
    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(10)],
        "doc_id long, text string",
    )
    model = lm.bigram_model(train, "doc_id", "text")
    score = lm.score_with_model(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps"), (2, "zz qq vv kk ww")],
            "doc_id long, text string",
        ),
        "doc_id", "text", model,
    )
    out = {r["doc_id"]: r for r in score.collect()}
    assert out[1]["avg_logp"] > out[2]["avg_logp"]  # in-domain beats unseen
    assert out[2]["n_bigrams"] == 4  # unseen bigrams still scored (floor)


def test_leakage_split_no_edge_crosses_splits_random_graphs(spark):
    import random

    from datawarehouse_backup_system_spark.operators import curation

    # one seed / sparse graph: each propagation round is a shuffle, so a
    # dense random graph (large-diameter giant component) makes this test
    # minutes-slow for no extra coverage
    for seed in (7,):
        rng = random.Random(seed)
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(n)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        split = {
            r["doc_id"]: r["split"]
            for r in curation.leakage_safe_split(docs, pairs, "doc_id").collect()
        }
        assert len(split) == n
        for a, b in edges:  # the core guarantee: no pair crosses splits
            assert split[a] == split[b], (seed, a, b)


def test_udtf_sentences_match_expression_path(spark):
    from pyspark.sql import functions as F

    from datawarehouse_backup_system_spark.functions.udtfs import (
        sentences_expr,
        sentences_udtf,
        split_sentences_py,
    )

    rows = [
        (1, "One. Two! Three? Four"),
        (2, "No boundaries here"),
        (3, "Trailing dot."),        # no whitespace after → one sentence
        (4, "A.B stays joined. but this splits"),
        (5, ""),
        # adversarial whitespace (r11 session review): the twins used
        # three different \s dialects — Python re (Unicode, matches
        # NBSP), Java (ASCII with VT), RE2 (ASCII without VT); all now
        # share the explicit WS_CLASS, so VT splits everywhere and NBSP
        # splits nowhere
        (6, "Vertical.\x0btab boundary"),
        (7, "Unicode. nbsp is NOT a boundary"),
        (8, "Newline?\nboundary. \t mixed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_expr = (
        df.select(
            "doc_id",
            F.posexplode(sentences_expr(F.col("text"))).alias("sent_idx", "sentence"),
        )
        .collect()
    )
    via_udtf = sentences_udtf(df, "doc_id", "text").collect()
    key = lambda r: (r["doc_id"], r["sent_idx"], r["sentence"])  # noqa: E731
    assert sorted(map(key, via_expr)) == sorted(map(key, via_udtf))
    # and both agree with the reference python implementation
    py = {(i, j, s) for i, t in rows for j, s in enumerate(split_sentences_py(t))}
    assert set(map(key, via_udtf)) == py
    assert not any(r["doc_id"] == 5 for r in via_udtf)  # empty → no rows
    # pinned WS_CLASS semantics, not just twin agreement
    by_doc = {}
    for r in sorted(via_udtf, key=key):
        by_doc.setdefault(r["doc_id"], []).append(r["sentence"])
    assert by_doc[6] == ["Vertical.", "tab boundary"]  # VT splits
    assert by_doc[7] == [rows[6][1]]  # NBSP does not split anywhere
    assert by_doc[8] == ["Newline?", "boundary.", "mixed"]
