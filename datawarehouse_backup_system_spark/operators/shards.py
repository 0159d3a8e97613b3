"""Training-shard export: split a curated corpus into N fixed shards.

Trainers consume data as numbered shard files (webdataset/tfrecord
style): workers each stream a disjoint shard subset, so shard assignment
must be deterministic, uniform, and reproducible across reruns — exactly
the content-hash recipe :mod:`sampling` uses. Shard id is
``md5(salt||key) % n_shards``: no global sort, no driver state, stable
on any partitioning and any engine.

- **shard_assign** — add the shard_id column (pure expression).
- **shard_manifest** — per-shard audit row (doc/token counts, key
  range): what a training job reads to plan worker assignment.
- **export_shards** — write the corpus as ``shard_id=K/`` parquet
  directories, one file per shard, rows in deterministic hash order
  within each shard (the "shuffled" serving order trainers want).

At 100 TB: assignment is map-side only; the export's single shuffle is
``repartition(n_shards, shard_id)`` — each output file is written by
exactly one task, so shard count should be sized to ~0.5–2 GB per shard
file (tens of thousands of shards at full scale, not 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators import text
from datawarehouse_backup_system_spark.operators.sampling import _bucket


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shard",
    out_col: str = "shard_id",
) -> DataFrame:
    """Deterministic uniform shard id: ``md5(salt||key) % n_shards``."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return df.withColumn(
        out_col, (_bucket(F.col(key_col), salt) % n_shards).cast("bigint")
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    text_col: str | None = None,
    salt: str = "shard",
) -> DataFrame:
    """Per-shard manifest: row count, key range, and (when ``text_col``
    given) total whitespace tokens — the planning input for a training
    job's worker/shard assignment. One partial-aggregatable groupBy."""
    assigned = shard_assign(df, key_col, n_shards, salt)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    ]
    if text_col is not None:
        aggs.append(
            F.sum(text.token_count(F.col(text_col))).cast("bigint").alias("n_tokens")
        )
    return assigned.groupBy("shard_id").agg(*aggs)


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Write ``path/shard_id=K/`` parquet, one file per shard, rows in
    deterministic hash order within the shard; returns the manifest.

    ``repartition(n_shards, shard_id)`` + ``partitionBy(shard_id)``:
    every shard is written by exactly one task (one file), and
    ``sortWithinPartitions`` gives the reproducible pseudo-random
    within-shard order trainers expect from a pre-shuffled corpus.
    """
    assigned = shard_assign(df, key_col, n_shards, salt)
    # sort key leads with shard_id: the dynamic-partition writer REQUIRES
    # a task-local sort on the partition column and would otherwise
    # replace this sort with its own (dropping the hash order); with the
    # shard_id prefix the requirement is already satisfied and the
    # within-shard (md5, key) order survives into the files
    (
        assigned.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions(
            F.col("shard_id"),
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
            F.col(key_col),
        )
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    return shard_manifest(df, key_col, n_shards, salt=salt)
