#!/usr/bin/env python
"""Tour of the round-4 scale toolkit in one script.

    python examples/scale_toolkit.py

1. EXACT near-dup pairs via prefix-filtered set-similarity join
   (no MinHash recall loss) over the testdata documents,
2. mergeable binned-quantile sketch: shard, merge, read p50/p99,
3. file-stats manifest: write a range-clustered table, plan a range
   query from the manifest, count files skipped,
4. per-group isotonic calibration (PAVA in applyInPandas).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark import get_spark
from datawarehouse_backup_system_spark.operators import quantiles as qsk
from datawarehouse_backup_system_spark.operators.calibration import (
    isotonic_calibrate,
)
from datawarehouse_backup_system_spark.operators.setjoin import (
    prefix_jaccard_join,
)
from datawarehouse_backup_system_spark.plans.table_format import (
    pruned_files,
    read_pruned,
    write_stats_manifest,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="scale-toolkit-example")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    print("== 1. exact set-similarity self-join (3-gram shingles, J>=0.5)")
    pairs = prefix_jaccard_join(
        docs, "doc_id", "text", threshold_num=1, threshold_den=2, shingle_n=3
    )
    pairs.orderBy("id_a", "id_b").show(5, truncate=False)

    print("== 2. mergeable quantile sketch over events value-cents")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    lo, hi = ev.agg(F.min("c"), F.max("c")).collect()[0]
    w = qsk.bin_width(lo, hi, 64)
    shards = [
        qsk.binned_histogram(
            ev.where(F.pmod("event_id", F.lit(3)) == s), "c", lo, hi, 64
        )
        for s in range(3)
    ]
    merged = qsk.merge_histograms(shards)
    qsk.histogram_quantiles(merged, [0.5, 0.99], lo, w).orderBy("q").show()

    print("== 3. manifest-planned range read")
    with tempfile.TemporaryDirectory() as d:
        table = Path(d) / "t"
        spark.range(0, 100_000).withColumn("v", F.col("id") * 3) \
            .repartitionByRange(16, "id").write.parquet(str(table))
        n = write_stats_manifest(spark, table, ["id"])
        kept = pruned_files(spark, table, "id", 1000, 2000)
        print(f"   manifest covers {n} files; range query scans {len(kept)}")
        print("   rows:", read_pruned(spark, table, "id", 1000, 2000).count())

    print("== 4. isotonic calibration (PAVA per group)")
    base = spark.createDataFrame(
        [(0, 0, 4, 5), (0, 1, 1, 5), (0, 2, 9, 10), (0, 3, 9, 12)],
        "g int, bucket int, y_sum long, n long",
    )
    isotonic_calibrate(base, ["g"]).orderBy("bucket").show()

    print("done")
    spark.stop()


if __name__ == "__main__":
    main()
