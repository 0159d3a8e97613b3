"""The ingest pipeline: the reference's daily cycle as ONE lazy plan.

Reference lifecycle E1 (``main.py:335-410``, SURVEY §3) rewrites a CSV on
disk up to four times between stages. Here stages e-h and j collapse into
a single DataFrame plan per file batch:

    scan (all-string) → rename/backfill (P1-P3) → row_hash (F1)
    → self-dedup J1 → history anti-join J2 → typed casts (F2-F7)
    → dense ids (F8) → replay guard J3 → snapshot append (S9)

Catalyst pipelines the projections and the two anti-joins; nothing
materializes until the final write. The ledger (S12/S13) provides
file-level idempotency exactly like the reference's processed_files table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_backup_system_spark import ledger as ledger_mod
from datawarehouse_backup_system_spark.ledger import Ledger
from datawarehouse_backup_system_spark.operators.cast import apply_typed_casts
from datawarehouse_backup_system_spark.operators.dedup import (
    anti_join_history,
    self_dedup_first,
)
from datawarehouse_backup_system_spark.operators.hashing import with_row_hash
from datawarehouse_backup_system_spark.operators.ids import (
    assign_dense_ids,
    next_id_watermark,
)
from datawarehouse_backup_system_spark.operators.normalize import normalize
from datawarehouse_backup_system_spark.registry import SchemaRegistry, TableSchema
from datawarehouse_backup_system_spark.sources.catalog import (
    Router,
    default_router,
    discover_files,
)
from datawarehouse_backup_system_spark.sources.csv_source import (
    extract_zip_first_member,
    read_raw_csv,
)


@dataclass
class FileResult:
    file_name: str
    status: str
    rows_in: int = 0
    rows_loaded: int = 0
    error: str | None = None


@dataclass
class IngestJob:
    spark: SparkSession
    registry: SchemaRegistry
    warehouse_dir: str | Path
    router: Router = field(default_factory=default_router)
    staging_dir: str | Path | None = None
    id_strategy: str = "distributed"
    #: partition column value for this run (ISO date); None → today.
    #: Snapshots are partitioned by ingest_date so retention (C2) becomes
    #: a metadata-only partition drop and incremental readers can prune.
    ingest_date: str | None = None

    def __post_init__(self) -> None:
        self.warehouse_dir = Path(self.warehouse_dir)
        self.warehouse_dir.mkdir(parents=True, exist_ok=True)
        self.ledger = Ledger(self.spark, self.warehouse_dir / "_ledger")

    # -- snapshot table helpers ------------------------------------------
    def table_path(self, schema: TableSchema) -> Path:
        return Path(self.warehouse_dir) / schema.table_name

    def read_table(self, schema: TableSchema) -> DataFrame:
        p = self.table_path(schema)
        if not p.exists() or not any(p.rglob("*.parquet")):
            return self.spark.createDataFrame([], schema.to_struct_type())
        return self.spark.read.parquet(str(p))

    # -- the per-file plan -----------------------------------------------
    def build_plan(self, raw: DataFrame, schema: TableSchema,
                   rename_map: dict[str, str], last_id: int) -> tuple[DataFrame, str | None]:
        """Everything between scan and write, as one lazy DataFrame."""
        normalized, report = normalize(raw, schema.data_columns, rename_map)
        if not report.ok:
            return raw, report.error
        hashed = with_row_hash(normalized, list(schema.data_columns))
        # ingest order: monotonically_increasing_id follows scan layout
        hashed = hashed.withColumn("_seq", F.monotonically_increasing_id())
        deduped = self_dedup_first(hashed, order_col="_seq")
        history = self.read_table(schema)
        novel = anti_join_history(deduped, history)
        casted = apply_typed_casts(novel, schema, passthrough=("row_hash", "_seq"))
        with_ids = assign_dense_ids(
            casted, order_cols=["_seq"], start=last_id, strategy=self.id_strategy
        ).drop("_seq")
        ingest_date = (
            F.lit(self.ingest_date).cast("date")
            if self.ingest_date
            else F.current_date()
        )
        final = with_ids.select(*schema.column_names).withColumn(
            "ingest_date", ingest_date
        )
        return final, None

    # -- file driver -------------------------------------------------------
    def process_file(self, path: str | Path) -> FileResult:
        path = Path(path)
        name = path.name
        try:
            if path.suffix.lower() == ".zip":
                staging = Path(self.staging_dir or self.warehouse_dir / "_staging")
                path = extract_zip_first_member(path, staging)
            table_key = self.router.route(name)
            if table_key is None or table_key not in self.registry.tables:
                self.ledger.append(name, ledger_mod.STATUS_NO_SCHEMA)
                return FileResult(name, ledger_mod.STATUS_NO_SCHEMA)
            schema = self.registry.get(table_key)
            rename_map = self.registry.rename_map(table_key)

            raw = read_raw_csv(self.spark, str(path))
            if raw.isEmpty():
                # reference records empty inputs distinctly
                # (util/data_processing.py:467-470)
                self.ledger.append(name, ledger_mod.STATUS_EMPTY)
                return FileResult(name, ledger_mod.STATUS_EMPTY)
            target = self.read_table(schema)
            last_id = next_id_watermark(target)
            plan, error = self.build_plan(raw, schema, rename_map, last_id)
            if error is not None:
                self.ledger.append(name, ledger_mod.STATUS_COLUMN_MISMATCH)
                return FileResult(name, ledger_mod.STATUS_COLUMN_MISMATCH, error=error)

            out = self.table_path(schema)
            plan.write.mode("append").partitionBy("ingest_date").parquet(str(out))
            loaded = int(
                self.spark.read.parquet(str(out))
                .where(F.col("id") > last_id).count()
            )
            self.ledger.append(name, ledger_mod.STATUS_UPLOADED)
            return FileResult(name, ledger_mod.STATUS_UPLOADED, rows_loaded=loaded)
        except Exception as exc:  # noqa: BLE001 — total function, D4
            status = f"{ledger_mod.STATUS_UNEXPECTED}: {type(exc).__name__}"
            self.ledger.append(name, status)
            return FileResult(name, status, error=str(exc))

    def run(self, input_dir: str | Path) -> list[FileResult]:
        """One cycle (reference main(), minus the daemon sleep — cadence is
        the scheduler's job, C4)."""
        processed = self.ledger.processed_set()
        results = []
        for f in discover_files(input_dir, processed):
            results.append(self.process_file(f))
        return results
