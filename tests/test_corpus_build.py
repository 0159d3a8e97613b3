"""End-to-end corpus build (plans/corpus_build.py): cross-stage
invariants over the composed pipeline — each stage's own semantics are
already oracle/pytest-verified individually. The pipeline runs twice
(module fixture): once for the invariants, twice for determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.plans.corpus_build import (
    build_training_corpus,
)


def _run(spark, out):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return build_training_corpus(
        spark,
        docs,
        out,
        keep_langs=("en", "de", "fr", "es", "ja"),  # keep the corpus real
        max_epochs=3,
        n_shards=4,
        capacity=256,
    )


@pytest.fixture(scope="module")
def builds(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_build")
    return root, _run(spark, root / "a"), _run(spark, root / "b")


def test_corpus_build_invariants(spark, builds):
    root, res, _ = builds
    assert 0 < res.n_kept <= res.n_input
    assert res.n_exported >= 1

    out = root / "a"
    report = spark.read.parquet(str(out / "curation_report"))
    shards = spark.read.parquet(str(out / "shards"))
    plan = spark.read.parquet(str(out / "packing_plan"))

    # every exported row's SOURCE passed every gate
    bad = shards.join(
        report.where(~F.col("keep")).select(
            F.col("doc_id").alias("source_id")
        ),
        "source_id",
    ).count()
    assert bad == 0

    # manifest totals equal the written rows; every shard id present
    assert sum(r["n_docs"] for r in res.manifest) == shards.count()
    assert sorted(r["shard_id"] for r in res.manifest) == [0, 1, 2, 3]

    # packing plan covers exactly the exported seq ids, offsets < capacity
    assert plan.count() == shards.count()
    assert plan.where(F.col("offset") >= 256).count() == 0
    assert (
        plan.select("seq_id").exceptAll(shards.select("seq_id")).count() == 0
    )

    # copies bounded by the epoch cap (stride packing stays collision-free)
    per_source = shards.groupBy("source_id").count()
    assert per_source.agg(F.max("count")).collect()[0][0] <= 3 + 1

    # review r8: the packing plan's coordinates must describe the
    # WRITTEN shards — same shard assignment, and within each shard the
    # (local_bin, offset) progression follows the file's physical row
    # order (md5 layout), so a trainer can seek by plan coordinates
    joined = plan.join(shards.select("seq_id", "shard_id"), "seq_id")
    assert joined.where(F.col("shard") != F.col("shard_id")).count() == 0
    file0 = sorted((root / "a" / "shards" / "shard_id=0").glob("*.parquet"))
    assert len(file0) == 1  # one file per shard
    import pyarrow.parquet as pq

    written_order = pq.read_table(str(file0[0]), columns=["seq_id"])[
        "seq_id"
    ].to_pylist()
    plan_order = [
        r["seq_id"]
        for r in plan.where("shard = 0")
        .orderBy("local_bin", "offset", "seq_id")
        .collect()
    ]
    assert written_order == plan_order


def test_corpus_build_no_two_exports_share_neardup_group(spark, builds):
    from datawarehouse_backup_system_spark.operators.dedup_approx import (
        dedup_groups,
        minhash_lsh_dedup,
    )

    root, res, _ = builds
    shards = spark.read.parquet(str(root / "a" / "shards"))
    sources = shards.select(
        F.col("source_id").alias("doc_id"), F.col("text")
    ).dropDuplicates(["doc_id"])
    pairs = minhash_lsh_dedup(
        sources, "doc_id", "text", threshold=0.5, max_bucket_size=20
    ).select("id_a", "id_b")
    # the exported canonical set must itself contain no near-dup pair
    # that the SAME pipeline parameters would have linked
    groups = dedup_groups(pairs)
    assert groups.where(F.col("node") != F.col("canonical_id")).count() == 0
    assert res.n_exported == shards.count()


def test_corpus_build_is_deterministic(builds):
    _, a, b = builds
    assert a.fingerprint == b.fingerprint
    assert a.n_exported == b.n_exported
    assert [r["n_docs"] for r in a.manifest] == [r["n_docs"] for r in b.manifest]
