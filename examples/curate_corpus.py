#!/usr/bin/env python
"""End-to-end training-data curation over the documents corpus.

    python examples/curate_corpus.py [out_dir]

The full pretraining-prep pipeline this engine provides, chained:

1. **curation verdict** — language / quality / repetition / exact-dedup
   gates per document (operators.curation.curation_report),
2. **decontamination** — drop docs overlapping a held-out eval set by
   word n-grams (operators.dedup_approx.contamination),
3. **near-dup pruning** — MinHash-LSH groups, keep one doc per group
   (minhash_lsh_dedup + dedup_groups),
4. **shard export** — the surviving corpus written as deterministic
   hash-assigned shard files with a manifest (operators.shards).

Each stage is the SAME operator the driver-contract queries verify
against DuckDB; this script only chains them.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark import get_spark
from datawarehouse_backup_system_spark.operators import shards
from datawarehouse_backup_system_spark.operators.curation import curation_report
from datawarehouse_backup_system_spark.operators.dedup_approx import (
    contamination,
    dedup_groups,
    minhash_lsh_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    spark = get_spark(app_name="curate-corpus")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. gate verdicts; keep survivors
    verdict = curation_report(docs, "doc_id", "text", keep_langs=("en",))
    kept = docs.join(
        verdict.where(F.col("keep")).select("doc_id"), "doc_id"
    )
    n1 = kept.count()

    # 2. decontaminate vs a pseudo-benchmark (every 97th doc)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    dirty = contamination(kept, ev, "doc_id", "text", n=3)
    clean = kept.join(dirty.select("doc_id"), "doc_id", "left_anti").where(
        F.col("doc_id") % 97 != 0
    )
    n2 = clean.count()

    # 3. near-dup groups → keep the smallest id per group
    pairs = minhash_lsh_dedup(
        clean, "doc_id", "text", shingle_n=3, k=9, band_size=3, threshold=0.5
    )
    groups = dedup_groups(pairs.select("id_a", "id_b"), "id_a", "id_b")
    losers = groups.where(F.col("node") != F.col("canonical_id")).select(
        F.col("node").alias("doc_id")
    )
    final = clean.join(losers, "doc_id", "left_anti")
    n3 = final.count()

    # 4. export shards + manifest
    manifest = shards.export_shards(final, str(out / "shards"), "doc_id", n_shards=4)
    print(f"docs: {n0} → keep-gates {n1} → decontaminated {n2} → deduped {n3}")
    print(f"shards written to {out}/shards:")
    for r in manifest.orderBy("shard_id").collect():
        print(f"  shard {r['shard_id']}: {r['n_docs']} docs, "
              f"ids [{r['min_key']}, {r['max_key']}]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
