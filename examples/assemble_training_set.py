#!/usr/bin/env python
"""Training-set assembly with the round-4 curation layer, end-to-end.

    python examples/assemble_training_set.py [workdir]

Chains the NEW operators on top of the corpus the driver tests ship:

1. **JSONL landing** — export the documents table as gzip JSONL, then
   re-ingest it with corrupt-line quarantine (sources.jsonl_source) —
   the interchange loop a real pipeline runs daily,
2. **line-level boilerplate removal** — cross-document frequent-line
   dedup (operators.text.line_dedup),
3. **per-domain quality floor** — drop the worst length-quartile per
   source (operators.sampling.quantile_filter),
4. **domain mixture** — deterministic hash sampling to per-source token
   budgets (operators.sampling.domain_mixture),
5. **chunking** — overlapping token windows sized for a context length
   (operators.text.chunk_documents),
6. **shard export** — Z-ordered write of the chunk table so multi-column
   scans (doc range × chunk range) prune files (operators.zorder).

Every stage is the SAME operator the driver-contract queries verify
against DuckDB (t11, t16, t12, t15, z01); this script only chains them.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark.operators.export import (
    export_snapshot_jsonl,
)
from datawarehouse_backup_system_spark.operators.sampling import (
    domain_mixture,
    quantile_filter,
)
from datawarehouse_backup_system_spark.operators.text import (
    chunk_documents,
    line_dedup,
    token_count,
)
from datawarehouse_backup_system_spark.operators.zorder import zorder_by
from datawarehouse_backup_system_spark.session import get_spark
from datawarehouse_backup_system_spark.sources.jsonl_source import (
    read_jsonl,
    split_corrupt,
)

SF_DIR = "/root/testdata/sf0.001"


def main(workdir: str) -> int:
    spark = get_spark(app_name="assemble-training-set")
    work = Path(workdir)

    # 1. JSONL interchange loop
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    landing = work / "landing"
    export_snapshot_jsonl(docs, landing)
    good, bad = split_corrupt(
        read_jsonl(spark, str(landing), schema=docs.schema)
    )
    print(f"jsonl ingest: {good.count()} good rows, {bad.count()} quarantined")

    # 2. line-level boilerplate removal (synthesize lines: docs are
    # single-line in the test corpus)
    lined = good.withColumn(
        "text", F.regexp_replace("text", r"((\S+\s+){7}\S+)\s+", "$1\n")
    )
    cleaned = line_dedup(lined, "doc_id", "text", min_df=10).withColumnRenamed(
        "clean_text", "text"
    )
    survivors = cleaned.where(F.col("n_kept") > 0).join(
        good.select("doc_id", "source"), "doc_id"
    )
    print(f"line dedup: {survivors.count()} docs with surviving lines")

    # 3. per-domain quality floor (drop worst length-quartile)
    scored = survivors.withColumn("n_tokens", token_count(F.col("text")))
    floored = quantile_filter(scored, "doc_id", "source", "n_tokens", 0.25)
    print(f"quality floor: {floored.count()} docs above per-source p25")

    # 4. domain mixture to token budgets
    targets = (
        floored.select("source")
        .distinct()
        .withColumn("target_tokens", F.lit(500).cast("bigint"))
    )
    mixed = domain_mixture(
        floored, "doc_id", "source", "n_tokens", targets, salt="ex"
    )
    mix_stats = mixed.groupBy("source").agg(
        F.sum("n_tokens").alias("tokens")
    )
    print(f"mixture: {mixed.count()} docs across {mix_stats.count()} domains")

    # 5. chunk to a context window
    chunks = chunk_documents(mixed, "doc_id", "text", chunk_tokens=32, overlap=8)
    print(f"chunking: {chunks.count()} chunks")

    # 6. Z-ordered shard write (prunes doc-range × chunk-range scans)
    out = work / "shards"
    zorder_by(chunks, ["doc_id", "chunk_id"], bits=12, n_partitions=4).drop(
        "_zcode"
    ).write.mode("overwrite").parquet(str(out))
    n = spark.read.parquet(str(out)).count()
    print(f"wrote {n} chunk rows to {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(
        main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
    )
