#!/usr/bin/env python
"""Quickstart: the engine end-to-end in one script.

    python examples/quickstart.py [workdir]

1. declares a table in the JSON registry format the reference uses,
2. ingests two dirty CSV exports (duplicates, bad values, missing column),
3. shows the typed, deduplicated, dense-id snapshot + ledger,
4. runs LLM-pipeline operators over the testdata documents/embeddings:
   near-dup detection, cosine top-k, quality scoring, train/val/test split,
5. runs a data-quality check suite.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from datawarehouse_backup_system_spark import get_spark
from datawarehouse_backup_system_spark.operators import expectations as ex
from datawarehouse_backup_system_spark.operators import similarity
from datawarehouse_backup_system_spark.operators.dedup_approx import minhash_lsh_dedup
from datawarehouse_backup_system_spark.operators.sampling import hash_split
from datawarehouse_backup_system_spark.operators.text import quality_features
from datawarehouse_backup_system_spark.plans.ingest import IngestJob
from datawarehouse_backup_system_spark.registry import SchemaRegistry
from datawarehouse_backup_system_spark.sources.catalog import Router

REGISTRY = {
    "orders_export": {
        "table_name": "orders_export",
        "column_names": ["id", "email", "qty", "amount", "order_ts", "row_hash"],
        "column_types": ["UInt64", "Nullable(String)", "Nullable(Int64)",
                         "Nullable(Float64)", "Nullable(DateTime)", "String"],
        "date_columns": ["order_ts"],
        "int_columns": ["qty"],
        "float_columns": ["amount"],
        "string_columns": ["email"],
    }
}

CSV_DAY1 = """Email;QTY;Montant;Date
a@example.com;2;10.50;2024-03-01 10:00:00
b@example.com;two;N/A;31/31/2024
a@example.com;2;10.50;2024-03-01 10:00:00
nan;3;7.25;05/03/2024 12:40
"""

CSV_DAY2 = """Email;QTY;Montant;Date
b@example.com;two;N/A;31/31/2024
c@example.com;5;99.00;2024-03-02 08:30:00
"""

RENAME = {"orders_export": {"Email": "email", "QTY": "qty",
                            "Montant": "amount", "Date": "order_ts"}}


def main() -> int:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp(prefix="quickstart_"))
    work.mkdir(parents=True, exist_ok=True)
    (work / "table_schema.json").write_text(json.dumps(REGISTRY))
    (work / "rename_mapping.json").write_text(json.dumps(RENAME))
    landing = work / "landing"
    landing.mkdir(exist_ok=True)
    (landing / "orders__day1.csv").write_text(CSV_DAY1)
    (landing / "orders__day2.csv").write_text(CSV_DAY2)

    spark = get_spark(app_name="quickstart")

    print("== 1. ingest two dirty exports ==")
    job = IngestJob(
        spark=spark,
        registry=SchemaRegistry.from_files(work / "table_schema.json",
                                           work / "rename_mapping.json"),
        warehouse_dir=work / "warehouse",
        router=Router().add(r"^orders__", "orders_export"),
    )
    for r in job.run(landing):
        print(f"   {r.file_name}: {r.status} (+{r.rows_loaded} rows)")
    table = job.read_table(job.registry.get("orders_export"))
    table.orderBy("id").show(truncate=False)
    job.ledger.read().select("file_name", "status").show(truncate=False)

    sf = "/root/testdata/sf0.001"
    print("== 2. near-duplicate detection (MinHash-LSH) ==")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"),
                    F.concat(F.lit("prefix "), F.col("text")).alias("text"))
    )
    dups = minhash_lsh_dedup(corpus, "doc_id", "text", threshold=0.5, max_bucket_size=20)
    print(f"   verified near-dup pairs: {dups.count()}")
    dups.orderBy("id_a").show(3)

    print("== 3. cosine top-3 neighbors for vec_id 0 ==")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    similarity.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=3).show()

    print("== 4. quality scoring + train/val/test split ==")
    quality_features(docs, "doc_id", "text").show(3)
    hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}) \
        .groupBy("split").count().show()

    print("== 5. data-quality checks on the fresh snapshot ==")
    ex.run_checks(table, [
        ex.not_null("email"),
        ex.unique("id"),
        ex.in_range("amount", 0, 1000),
    ]).show(truncate=False)

    spark.stop()
    print(f"done (workdir: {work})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
