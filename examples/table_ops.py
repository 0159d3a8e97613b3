#!/usr/bin/env python
"""Tour of the write-id table format's ACID surface in one script.

    python examples/table_ops.py

append (atomic) → DESCRIBE HISTORY → time travel → change feed →
OPTIMIZE ZORDER (atomic composite commit) → RESTORE → VACUUM →
file-stats manifest + pruned range read → bloom manifest + point-lookup
candidates → optimistic version check.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datawarehouse_backup_system_spark import get_spark
from datawarehouse_backup_system_spark.ledger import Ledger
from datawarehouse_backup_system_spark.plans.table_format import (
    WriteIdParquetFormat,
    delete_from_table,
    diff_versions,
    merge_into_table,
    optimize_zorder,
    pruned_files,
    restore_to_version,
    vacuum,
    write_stats_manifest,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("ingest_date", T.DateType()),
    ]
)


def main() -> None:
    spark = get_spark(app_name="table-ops-example")
    root = Path(tempfile.mkdtemp(prefix="table_ops_"))
    table = root / "t"
    fmt = WriteIdParquetFormat(
        Ledger(spark, root / "_ledger"), root,
        move=lambda s, d: s.rename(d),
    )

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"), (F.col("id") * 7).alias("v"),
            F.lit("2024-01-05").cast("date").alias("ingest_date"),
        )

    print("== append two versions")
    fmt.append(batch(0, 1000), table, "t")
    fmt.append(batch(1000, 1500), table, "t")
    print("   history:", [(h["version"], h["write_id"][:6]) for h in fmt.versions("t")])

    print("== time travel")
    for ver in (1, 2):
        n = fmt.read_as_of(spark, table, SCHEMA, "t", version=ver).count()
        print(f"   version {ver}: {n} rows")

    print("== change feed v1 -> v2")
    feed = diff_versions(spark, fmt, table, SCHEMA, "t", 1, 2, key_cols=["id"])
    print("   changes:", {r["change"]: 1 for r in feed.limit(1).collect()},
          "n =", feed.count())

    print("== OPTIMIZE ZORDER (content-preserving atomic rewrite)")
    res = optimize_zorder(spark, fmt, table, SCHEMA, "t", ["id", "v"], n_partitions=4)
    print(f"   rewritten {res['rewritten']} rows; "
          f"files {res['files_before']} -> {res['files_after']}")
    print("   history after optimize:", [h["version"] for h in fmt.versions("t")])

    print("== append, then RESTORE back past it + VACUUM stragglers")
    fmt.append(batch(9000, 9100), table, "t")
    print("   rows now:", fmt.read_as_of(spark, table, SCHEMA, "t").count())
    restore_to_version(fmt, table, "t", 1)
    print("   rows after restore:", fmt.read_as_of(spark, table, SCHEMA, "t").count())
    print("   vacuum swept:", vacuum(fmt, table, "t"), "files")

    print("== MERGE (upsert) and DELETE WHERE as atomic versions")
    updates = batch(1490, 1510)
    merge_into_table(spark, fmt, table, SCHEMA, "t", updates, key="id")
    n = fmt.read_as_of(spark, table, SCHEMA, "t").count()
    print(f"   after MERGE (10 updates + 10 inserts): {n} rows")
    delete_from_table(spark, fmt, table, SCHEMA, "t", "id % 2 = 1")
    n = fmt.read_as_of(spark, table, SCHEMA, "t").count()
    print(f"   after DELETE WHERE odd: {n} rows")

    print("== manifest-planned range read")
    n_files = write_stats_manifest(spark, table, ["id"])
    kept = pruned_files(spark, table, "id", 100, 200)
    print(f"   manifest covers {n_files} files; range query scans {len(kept)}")

    print("== bloom-manifest point lookup")
    from datawarehouse_backup_system_spark.plans.table_format import (
        bloom_candidate_files,
        write_bloom_manifest,
    )

    write_bloom_manifest(spark, table, "id")
    cand = bloom_candidate_files(spark, table, "id", 150)
    print(f"   point read id=150 scans {len(cand)} of {n_files} files")

    print("== optimistic version check")
    from datawarehouse_backup_system_spark.plans.table_format import (
        VersionConflictError,
        rewrite_table,
    )

    stale = len(fmt.ledger.committed_writes("t")) - 1  # planned too early
    try:
        rewrite_table(spark, fmt, table, SCHEMA, "t", lambda c: c,
                      expected_version=stale)
    except VersionConflictError as e:
        print(f"   refused stale rewrite: {e}")

    shutil.rmtree(root, ignore_errors=True)
    print("done")
    spark.stop()


if __name__ == "__main__":
    main()
