"""Upsert / MERGE emulation and snapshot maintenance on plain parquet.

Delta/Iceberg (not in this image) provide transactional MERGE INTO and
OPTIMIZE; these operators emulate the two workhorses on snapshot
directories (SURVEY §2 S9's parity sink), with the same DataFrame shapes
a lakehouse MERGE would plan:

- **merge_upsert** — keyed upsert: updates win over target rows with the
  same key (anti-join + union — one shuffle on the key, broadcast when
  the update batch is small).
- **scd2_apply** — slowly-changing-dimension type 2: close the current
  version of changed keys (valid_to stamped) and append the new version
  (valid_from stamped, open-ended).
- **compact_partition** — small-file compaction: rewrite one partition
  directory into ``target_files`` files (daily appends leave one file
  per batch; thousands of small files slow every scan at 100 TB).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``target``; new keys
    append. Pure plan — caller writes the result (overwrite or versioned
    snapshot).

    A MERGE requires at most one update row per key. When ``order_col``
    is given, duplicate-key updates resolve last-write-wins by that
    column (ties broken arbitrarily are not allowed: the column must be a
    total order per key); when None, ``updates`` MUST be key-unique —
    duplicates would corrupt the one-row-per-key snapshot downstream.

    NULL join keys follow SQL MERGE semantics (Delta behaves the same):
    NULL never equals NULL, so a NULL-keyed update row INSERTS alongside
    a NULL-keyed target row instead of replacing it. Scrub or surrogate
    NULL keys upstream when replacement semantics are required.
    """
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    if order_col is not None:
        # last-write-wins dedup applies only to NON-NULL-keyed rows:
        # Window.partitionBy groups all NULL keys into ONE partition,
        # so the row_number would silently collapse every NULL-keyed
        # insert into one — contradicting the MERGE semantics above
        # (NULL never equals NULL; each inserts) and flipping data
        # loss on an unrelated parameter (review r9)
        null_key = F.lit(False)
        for k in keys:
            null_key = null_key | F.col(k).isNull()
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        keyed = (
            updates.where(~null_key)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        updates = keyed.unionByName(updates.where(null_key))
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str | list[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    change_ts_col: str = "_change_ts",
) -> DataFrame:
    """SCD type-2: for each changed key, close the open version at the
    change timestamp and append the new version as the open row.

    ``dim`` carries (key..., attributes..., valid_from, valid_to NULL for
    open); ``changes`` carries (key..., attributes..., _change_ts).
    """
    from pyspark.sql import Window

    keys = [key] if isinstance(key, str) else list(key)
    closing_ts = changes.groupBy(*keys).agg(
        F.min(change_ts_col).alias("_close_ts")
    )
    open_rows = dim.where(F.col(end_col).isNull())
    closed_now = (
        open_rows.join(closing_ts, keys, "inner")
        # cast like the new_versions branch: an uncast _close_ts of a
        # different type would widen the whole valid_to column through
        # unionByName coercion (string beats timestamp) — silently
        # changing the dimension's schema for ALL rows
        .withColumn(
            end_col,
            F.col("_close_ts").cast(dim.schema[end_col].dataType),
        )
        .drop("_close_ts")
    )
    untouched_open = open_rows.join(closing_ts.select(*keys), keys, "left_anti")
    history = dim.where(F.col(end_col).isNotNull())
    # multiple changes per key in one batch: chain versions — each change
    # is valid until the NEXT change's timestamp; only the last stays open
    w = Window.partitionBy(*keys).orderBy(F.col(change_ts_col).asc())
    new_versions = (
        changes.withColumn("_next_ts", F.lead(change_ts_col).over(w))
        .withColumnRenamed(change_ts_col, effective_col)
        # cast valid_from like valid_to (review r9: an uncast string
        # change feed widened the dimension's valid_from column to
        # string for EVERY row through unionByName coercion — the
        # exact failure the end_col comment above warns about)
        .withColumn(
            effective_col,
            F.col(effective_col).cast(dim.schema[effective_col].dataType),
        )
        .withColumn(end_col, F.col("_next_ts").cast(dim.schema[end_col].dataType))
        .drop("_next_ts")
    )
    return (
        history.unionByName(closed_now)
        .unionByName(untouched_open)
        .unionByName(new_versions.select(*history.columns))
    )


def compact_partition(
    spark: SparkSession,
    table_path: str | Path,
    partition: str,
    target_files: int = 1,
) -> int:
    """Rewrite one partition dir (e.g. ``ingest_date=2024-01-05``) into
    ``target_files`` parquet files. Returns files before compaction.

    Staging and backup dirs are ``_``-prefixed, which Spark's file index
    ignores — concurrent table-root readers never discover half-written
    or duplicate data. The swap itself is two renames, so a reader racing
    exactly between them can miss the partition for that instant; a table
    format (Delta/Iceberg) is the transactional answer, noted in SCALE.md.
    Crash recovery: a leftover backup with no live partition dir is
    restored; a stale backup next to a live dir is removed.

    Raises FileNotFoundError for a nonexistent partition (a silent 0
    would mask operator typos).
    """
    table_path = Path(table_path)
    part_dir = table_path / partition
    backup = table_path / f"_compact_backup_{partition}"
    if backup.exists():
        if part_dir.exists():
            shutil.rmtree(backup)       # stale: crash after a completed swap
        else:
            backup.rename(part_dir)     # crash between the two renames
    # orphaned staging from a crash between the staging write and the
    # first rename (review r9: unlike delete_where, these whole-
    # partition-sized copies were never reclaimed and accumulated
    # across crash/retry cycles)
    for stray in table_path.glob("_compact_tmp_*"):
        shutil.rmtree(stray, ignore_errors=True)
    if not part_dir.exists():
        raise FileNotFoundError(f"no such partition: {part_dir}")
    files_before = len(list(part_dir.glob("*.parquet")))
    if files_before <= target_files:
        return files_before
    df = spark.read.parquet(str(part_dir))
    staging = Path(tempfile.mkdtemp(prefix="_compact_tmp_", dir=table_path))
    df.coalesce(target_files).write.mode("overwrite").parquet(str(staging))
    part_dir.rename(backup)
    staging.rename(part_dir)
    shutil.rmtree(backup)
    return files_before


def delete_where(
    spark: SparkSession,
    table_path: str | Path,
    condition,
    partition_col: str = "ingest_date",
) -> int:
    """Targeted row delete (the right-to-be-forgotten / bad-batch purge
    a warehouse needs): copy-on-write rewrite of ONLY the partitions
    containing matching rows, with :func:`compact_partition`'s
    backup/swap protocol per partition. Untouched partitions keep their
    files byte-identical — at 100 TB a delete of one user's rows
    rewrites a handful of date partitions, never the table. Returns the
    number of rows deleted.

    A first pass finds affected partitions by pushing the predicate
    down to the scan (min/max + dictionary stats prune most files
    before any row is read). Like any physical delete, history is
    GONE: earlier ``read_as_of`` versions of rewritten partitions no
    longer reproduce (same as Delta VACUUM after DELETE); run
    retention/compliance deletes AFTER any audit export.
    """
    table_path = Path(table_path)
    # Recovery FIRST, by scanning for leftover backups — not inside the
    # per-affected-partition loop: a crash between the two swap renames
    # hides that partition's rows, so it can never re-enter `affected`
    # and a loop-scoped recovery would never restore it (review r7).
    for backup in sorted(table_path.glob("_delete_backup_*")):
        part_dir = table_path / backup.name[len("_delete_backup_"):]
        if part_dir.exists():
            shutil.rmtree(backup)       # stale: crash after the swap
        else:
            backup.rename(part_dir)     # crash between the renames
    for stray in table_path.glob("_delete_tmp_*"):
        shutil.rmtree(stray, ignore_errors=True)

    df = spark.read.parquet(str(table_path))
    # affected partition DIRECTORIES from the matched files themselves
    # (input_file_name), never reconstructed from values (review r9:
    # f"{col}={str(v)}" broke on NULL partitions — Spark writes
    # __HIVE_DEFAULT_PARTITION__, str(None) gives 'None' — and on any
    # value Spark's Hive escaping percent-encodes, aborting the purge
    # half-done with FileNotFoundError on every retry)
    from urllib.parse import unquote, urlparse

    matched = [
        r["f"]
        for r in df.where(condition)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    part_dirs = sorted({
        Path(unquote(urlparse(f).path)).parent for f in matched
    })
    root = table_path.resolve()
    deleted = 0
    for part_dir in part_dirs:
        if part_dir.resolve() == root:
            raise ValueError(
                f"{table_path} is not partitioned — delete_where's "
                "copy-on-write swap needs partition directories"
            )
        partition = part_dir.name
        backup = table_path / f"_delete_backup_{partition}"
        # basePath keeps the partition column resolvable in the
        # predicate; drop it before the rewrite so the new files keep
        # the partition-in-directory physical layout. Persisted: the
        # two counts and the rewrite otherwise scan the partition
        # three times (review r9).
        pdf = spark.read.option("basePath", str(table_path)).parquet(
            str(part_dir)
        ).persist()
        try:
            # coalesce(cond, False): rows where the predicate is NULL
            # are KEPT — bare ~condition is NULL for them, silently
            # deleting every NULL-keyed row in a touched partition
            # (3VL; review r7)
            keep = pdf.where(~F.coalesce(condition, F.lit(False))).drop(
                partition_col
            )
            n_keep = keep.count()
            n_del = pdf.count() - n_keep
            if n_del == 0:
                continue
            if n_keep == 0:
                # whole partition deleted: REMOVE the dir — an empty
                # rewrite would leave a parquet dir with no data files,
                # which direct per-partition reads reject ('Unable to
                # infer schema'; review r9)
                part_dir.rename(backup)
                shutil.rmtree(backup)
            else:
                staging = Path(
                    tempfile.mkdtemp(prefix="_delete_tmp_", dir=table_path)
                )
                keep.write.mode("overwrite").parquet(str(staging))
                part_dir.rename(backup)
                staging.rename(part_dir)
                shutil.rmtree(backup)
            deleted += n_del
        finally:
            pdf.unpersist()
    return deleted
