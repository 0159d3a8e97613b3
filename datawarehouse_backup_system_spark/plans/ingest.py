"""The ingest pipeline: the reference's daily cycle as ONE lazy plan.

Reference lifecycle E1 (``main.py:335-410``, SURVEY §3) rewrites a CSV on
disk up to four times between stages. Here stages e-h and j collapse into
a single DataFrame plan per file batch:

    scan (all-string) → rename/backfill (P1-P3) → row_hash (F1)
    → self-dedup J1 → history anti-join J2 → typed casts (F2-F7)
    → dense ids (F8) → snapshot append (S9, partitioned by ingest_date)

Catalyst pipelines the projections and the anti-join; nothing
materializes until the final write. The ledger (S12/S13) provides
file-level idempotency exactly like the reference's processed_files table.

**Ingest order** (first-occurrence dedup + id order) is exact file order,
reconstructed distributively as the composite
``(_file_rank, _metadata.file_block_start, monotonically_increasing_id)``:
file rank follows listing order, block start orders a file's splits (the
scheduler packs blocks by size, so mono-id alone does NOT follow file
order on multi-block files), and mono-id orders rows within a block.
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

#: composite ingest-order columns carried through the plan
SEQ_COLS = ("_file_rank", "_blk", "_row")


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
        from datawarehouse_backup_system_spark.plans.table_format import (
            WriteIdParquetFormat,
        )

        self.warehouse_dir = Path(self.warehouse_dir)
        self.warehouse_dir.mkdir(parents=True, exist_ok=True)
        self.ledger = Ledger(self.spark, self.warehouse_dir / "_ledger")
        # the Delta/Iceberg seam: every snapshot read/append/recover goes
        # through this format object (see plans/table_format.py); the
        # publish hook stays late-bound so storage overrides on the job
        # class apply
        self.fmt = WriteIdParquetFormat(
            self.ledger, self.warehouse_dir,
            move=lambda src, dst: self._publish_file(src, dst),
        )

    # -- snapshot table helpers ------------------------------------------
    def table_path(self, schema: TableSchema) -> Path:
        return Path(self.warehouse_dir) / schema.table_name

    def read_table(self, schema: TableSchema) -> DataFrame:
        return self.fmt.read(
            self.spark, self.table_path(schema), schema.to_struct_type()
        )

    # -- plan pieces -------------------------------------------------------
    def _scan_with_seq(self, paths: list[Path]) -> DataFrame:
        """Multi-path all-string scan + the exact-ingest-order columns.

        File rank comes from a broadcast join against a tiny (name, rank)
        frame keyed on the scan URI's basename — O(1) per row (a
        create_map literal would be an O(#files) probe per row and blow
        codegen at thousands of files). ``input_file_name()`` is
        URL-encoded, so each file contributes both its raw and its
        percent-encoded name as join keys; an unmatched file raises
        loudly rather than silently corrupting the ingest order.
        """
        from urllib.parse import quote

        if len({p.name for p in paths}) < len(paths):
            raise ValueError(
                "duplicate basenames in one scan batch (file rank joins on "
                f"basename): {sorted(p.name for p in paths)} — split the batch"
            )
        raw = read_raw_csv(self.spark, [str(p) for p in paths])
        # loud reserved-name guard (review r10, the r7/r8 basename/_rn
        # pattern): a raw column named like a seq/rank column would be
        # silently OVERWRITTEN by withColumn below — and, because
        # SEQ_COLS are appended to normalize's expected set, such a
        # header would also fool width validation instead of being
        # rejected as an unknown column.
        reserved = set(SEQ_COLS) | {"_fname", "_blk"}
        clash = sorted(reserved & set(raw.columns))
        if clash:
            raise ValueError(
                f"raw CSV header uses reserved ingest column name(s) "
                f"{clash}: rename the source columns"
            )
        keys = []
        for i, p in enumerate(paths):
            keys.append((p.name, i))
            enc = quote(p.name, safe="")
            if enc != p.name:
                keys.append((enc, i))
        # collision check over the FULL key list, not just raw names: a
        # literal 'a%20b.csv' next to 'a b.csv' (whose encoded key is
        # also 'a%20b.csv') would double-join every row of the latter
        # and corrupt the exact-ingest-order rank (review r7)
        if len({k for k, _ in keys}) < len(keys):
            raise ValueError(
                "file-rank key collision (a basename equals a sibling's "
                f"percent-encoded basename): {sorted(k for k, _ in keys)} "
                "— split the batch"
            )
        ranks = self.spark.createDataFrame(keys, "_fname string, _file_rank int")
        basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
        # capture metadata/order columns BEFORE the join: hidden _metadata
        # (and input_file_name) resolve only on the scan lineage, not
        # through join outputs
        base = (
            raw.withColumn("_fname", basename)
            .withColumn("_blk", F.col("_metadata.file_block_start"))
            .withColumn("_row", F.monotonically_increasing_id())
        )
        out = base.join(F.broadcast(ranks), "_fname", "left")
        guarded_rank = F.when(
            F.col("_file_rank").isNull(),
            F.raise_error(
                F.concat(F.lit("unmatchable scan uri for file-rank: "),
                         F.col("_fname"))
            ).cast("int"),
        ).otherwise(F.col("_file_rank"))
        return out.withColumn("_file_rank", guarded_rank).drop("_fname")

    def build_plan(
        self,
        raw: DataFrame,
        schema: TableSchema,
        rename_map: dict[str, str],
        last_id: int,
    ) -> tuple[DataFrame | None, str | None]:
        """Everything between scan and write, as one lazy DataFrame.
        ``raw`` must carry SEQ_COLS (see _scan_with_seq)."""
        normalized, report = normalize(
            raw, (*schema.data_columns, *SEQ_COLS), rename_map
        )
        if not report.ok:
            return None, report.error
        hashed = with_row_hash(normalized, list(schema.data_columns))
        deduped = self_dedup_first(hashed, order_col=list(SEQ_COLS))
        novel = self._dedup_against_history(deduped, schema)
        casted = apply_typed_casts(
            novel, schema, passthrough=("row_hash", *SEQ_COLS)
        )
        with_ids = assign_dense_ids(
            casted, order_cols=list(SEQ_COLS), start=last_id,
            strategy=self.id_strategy,
        ).drop(*SEQ_COLS)
        ingest_date = (
            F.lit(self.ingest_date).cast("date")
            if self.ingest_date
            else F.current_date()
        )
        final = with_ids.select(*schema.column_names).withColumn(
            "ingest_date", ingest_date
        )
        return final, None

    def _ingest(
        self,
        paths: list[Path],
        table_key: str,
        label: str,
        ledger_names: list[str] | None = None,
    ) -> FileResult:
        """Shared core: scan → plan → write → ledger, for 1..N files.

        ``ledger_names`` are the names recorded for idempotency — the
        ORIGINAL landing names (e.g. the .zip, not its extracted member),
        since run()'s skip check compares against the listing.
        """
        from pyspark.sql import Observation

        names = ledger_names or [p.name for p in paths]
        schema = self.registry.get(table_key)
        rename_map = self.registry.rename_map(table_key)
        raw = self._scan_with_seq(paths)
        if raw.drop(*SEQ_COLS).isEmpty():
            # reference records empty inputs distinctly
            # (util/data_processing.py:467-470)
            self.ledger.append_many(
                [(n, ledger_mod.STATUS_EMPTY) for n in names]
            )
            return FileResult(label, ledger_mod.STATUS_EMPTY)
        target = self.read_table(schema)
        last_id = next_id_watermark(target)
        # rows_in rides the write job as an Observation on the pre-dedup
        # scan (review r10: the field was never populated — process_batch
        # summed a dressed-up constant 0). Attached AFTER the isEmpty
        # probe above: isEmpty short-circuits with a limit and would
        # otherwise satisfy the Observation with a partial count.
        obs_in = Observation()
        raw = raw.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
        plan, error = self.build_plan(raw, schema, rename_map, last_id)
        if error is not None:
            self.ledger.append_many(
                [(n, ledger_mod.STATUS_COLUMN_MISMATCH) for n in names]
            )
            return FileResult(label, ledger_mod.STATUS_COLUMN_MISMATCH, error=error)
        try:
            loaded = self._atomic_append(plan, schema)
        except Exception as exc:  # noqa: BLE001 — reference 'insert error'
            self.ledger.append_many(
                [(n, ledger_mod.STATUS_INSERT_ERROR) for n in names]
            )
            return FileResult(
                label, ledger_mod.STATUS_INSERT_ERROR, error=str(exc)
            )
        # one ledger job + one file for the whole batch (0.35 s and a
        # ledger part-file PER NAME otherwise — review r7)
        self.ledger.append_many(
            [(n, ledger_mod.STATUS_UPLOADED) for n in names]
        )
        try:
            rows_in = int(obs_in.get["rows_in"])
        except Exception:  # noqa: BLE001 — metric must never sink an upload
            rows_in = 0
        return FileResult(
            label, ledger_mod.STATUS_UPLOADED,
            rows_in=rows_in, rows_loaded=loaded,
        )

    # -- exports (S10/S11 parity + watermark write-back) -------------------
    def export_table_csv(
        self, table_key: str, out_dir: str | Path, single_file: bool = False
    ) -> Path:
        """Re-publish a table's cleaned snapshot as headered CSV
        (reference main.py:296-305 ``processed/{table}/`` handoff)."""
        from datawarehouse_backup_system_spark.operators.export import (
            export_snapshot_csv,
        )

        schema = self.registry.get(table_key)
        return export_snapshot_csv(
            self.read_table(schema), out_dir, single_file=single_file
        )

    def export_watermarks(
        self, schema_path: str | Path, out_path: str | Path
    ) -> Path:
        """Export a registry JSON copy with each table's ``last_id``
        refreshed from its snapshot MAX(id) (reference
        util/data_pushing.py:430-460, as a read-only export). Tables this
        engine never ingested keep their DECLARED last_id — writing 0
        over a nonzero declared watermark would make reference tooling
        re-extract everything."""
        from datawarehouse_backup_system_spark.operators.export import (
            export_registry_watermarks,
        )

        last_ids = {}
        for key, schema in self.registry.tables.items():
            wm = next_id_watermark(self.read_table(schema))
            if wm > 0:
                last_ids[key] = wm
        return export_registry_watermarks(schema_path, out_path, last_ids)

    # -- atomic snapshot append -------------------------------------------
    def _dedup_against_history(
        self, deduped: DataFrame, schema: TableSchema
    ) -> DataFrame:
        """J2 with the scale auto-switch (VERDICT r10 item 6, the same
        footprint-threshold pattern as graph._stage_static_side): below
        ``SPARK_GRAFT_J2_INDEX_MIN_BYTES`` (default 4 GiB) of on-disk
        table footprint, the plain column-pruned history anti-join runs —
        at local scale its per-file shuffle is a broadcast under AQE and
        the index would only add write overhead. Above it, the batch
        anti-joins the persisted row_hash index bucketed on the join key
        (:mod:`~.hash_index`), so a 100 TB history is never re-shuffled
        per file: ONE Exchange, batch side only (plan contract pinned in
        tests/test_hash_index.py). The index validates itself against
        the live file listing and falls back to the plain path whenever
        it cannot account for the table — fallback is always correct."""
        from datawarehouse_backup_system_spark.plans import hash_index

        tp = self.table_path(schema)
        # ONE directory walk serves both the footprint threshold and
        # the live-pair listing (review r11: a separate _stage_du pass
        # re-walked every data file per ingested file)
        listed = hash_index.live_write_pairs(tp)
        if (
            listed is not None
            and listed[2] >= hash_index.index_min_bytes()
        ):
            idx = hash_index.history_hash_frame(
                self.spark, Path(self.warehouse_dir), tp,
                schema.table_name, listed=listed,
            )
            if idx is not None:
                return deduped.join(idx, "row_hash", "left_anti")
        return anti_join_history(deduped, self.read_table(schema))

    def _atomic_append(self, plan: DataFrame, schema: TableSchema) -> int:
        """Append ``plan`` to the snapshot through the table format
        (:mod:`~.table_format`): the shipped
        :class:`~.table_format.WriteIdParquetFormat` brackets the write
        with ledger markers so a mid-write crash never leaves an
        unrollbackable partial table; a Delta/Iceberg format would get
        atomicity from its transaction log instead. Returns rows written
        (Observation on the written plan — no post-write re-scan)."""
        return self.fmt.append(plan, self.table_path(schema), schema.table_name)

    def _publish_file(self, src: Path, dst: Path) -> None:
        """Move one staged data file into the live table. Override point
        for non-POSIX storage.

        On a local/HDFS filesystem ``rename`` is atomic: readers see the
        whole file or nothing. On object stores "rename" is copy+delete
        (S3A) — NOT atomic as an operation — but the protocol's crash
        safety does not depend on it: the destination carries the
        ``w<write_id>-`` prefix from the first byte, so a crash mid-copy
        leaves a partial object that :meth:`recover_writes` deletes BY
        NAME, never needing to read it (pytest: corrupt-partial recovery
        test). What IS lost off-POSIX is reader isolation during the
        copy window: a concurrent reader can observe a truncated object
        on stores that expose in-progress writes. On real S3 this does
        not occur (objects appear only at PUT completion); for stores
        where it can, override this to upload to the final key in one
        multipart commit, or route readers through the ledger's
        committed-write view."""
        src.rename(dst)

    def recover_writes(self, inflight_ttl_s: float = 3600.0) -> list[str]:
        """Roll back writes that began but never committed (crash between
        the begin and commit markers): delete that write-id's prefixed
        files from the live table, drop its inflight staging dir, and
        ledger ``write aborted``. The batch's landing files were never
        ledgered as uploaded, so the next cycle re-ingests them cleanly.
        Returns the aborted write ids (details + the orphaned-staging
        sweep: :meth:`~.table_format.WriteIdParquetFormat.recover`)."""
        return self.fmt.recover(
            lambda table_name: Path(self.warehouse_dir) / table_name,
            inflight_ttl_s,
        )

    # -- file drivers ------------------------------------------------------
    def process_file(
        self, path: str | Path, table_key: str | None = None
    ) -> FileResult:
        """One file through the full pipeline, every failure ledgered
        (D4 total function).

        ``table_key``: optional routing override — when the caller
        already knows the table (process_batch's divergent fallback),
        filename routing is skipped, so a valid file whose NAME the
        router cannot map is still ingested instead of being ledgered
        NO_SCHEMA forever (review r9: the batch fallback re-routed by
        filename and could permanently drop a divergent file's rows).

        CONCURRENCY: building block — takes no :class:`WriterLease` and
        runs no recovery; :meth:`run` provides both. A caller invoking
        this directly on a shared warehouse must hold the lease (the
        write-id format is single-writer) and recover first, or an
        uncommitted crashed write's files leak into read_table's history
        view and anti-join freshly re-ingested rows away."""
        import zipfile

        path = Path(path)
        name = path.name
        extracted: Path | None = None
        try:
            if path.suffix.lower() == ".zip":
                staging = Path(self.staging_dir or self.warehouse_dir / "_staging")
                try:
                    path = extracted = extract_zip_first_member(path, staging)
                except (zipfile.BadZipFile, ValueError):
                    # corrupt or empty archive (reference main.py:97)
                    self.ledger.append(name, ledger_mod.STATUS_EXTRACTION_FAILED)
                    return FileResult(name, ledger_mod.STATUS_EXTRACTION_FAILED)
                except OSError as exc:
                    self.ledger.append(name, ledger_mod.STATUS_EXTRACTION_CRITICAL)
                    return FileResult(
                        name, ledger_mod.STATUS_EXTRACTION_CRITICAL, error=str(exc)
                    )
            # reference main.py:107 checks the (extracted) name's suffix;
            # beyond-reference: .csv.gz passes — the driver-side sniffers
            # gunzip transparently and Spark's csv reader has the codec
            suffixes = [s.lower() for s in path.suffixes]
            is_csv = suffixes[-1:] == [".csv"] or suffixes[-2:] == [".csv", ".gz"]
            if not is_csv:
                self.ledger.append(name, ledger_mod.STATUS_NOT_CSV)
                return FileResult(name, ledger_mod.STATUS_NOT_CSV)
            if table_key is None:
                table_key = self.router.route(name)
            if table_key is None or table_key not in self.registry.tables:
                self.ledger.append(name, ledger_mod.STATUS_NO_SCHEMA)
                return FileResult(name, ledger_mod.STATUS_NO_SCHEMA)
            return self._ingest([path], table_key, name, ledger_names=[name])
        except Exception as exc:  # noqa: BLE001 — total function, D4
            status = f"{ledger_mod.STATUS_UNEXPECTED}: {type(exc).__name__}"
            self.ledger.append(name, status)
            return FileResult(name, status, error=str(exc))
        finally:
            # the extracted member is fully consumed by the time
            # _ingest returns (the append is materialized) and its
            # ledger entry is the ZIP's name — leaving it leaked one
            # plaintext copy per zip per cycle into _staging forever,
            # and a later zip with the same member name silently
            # overwrote it (review r10)
            if extracted is not None:
                extracted.unlink(missing_ok=True)

    def process_batch(self, paths: list[str | Path], table_key: str) -> FileResult:
        """Scale path: ingest MANY same-table files as ONE distributed plan.

        A production cycle sees thousands of files; per-file plans
        serialize scheduling overhead. This runs one multi-path scan with
        reference-exact dedup order (first occurrence in file order,
        SEQ_COLS composite). The multi-path scan requires one header
        layout / encoding / delimiter — the pre-check below compares the
        full (encoding, delimiter, header) triple per file, not just the
        parsed header: a semicolon file parses to the same header list
        as its comma siblings under its OWN sniffed delimiter, yet the
        single multi-path scan reads it with the FIRST file's settings
        and silently misparses every row (review r7). Files whose
        profile differs from the batch's are NOT failed — they fall
        back to per-file ingestion under their own sniffed settings
        (review r8: ledgering them COLUMN_MISMATCH marked perfectly
        valid files processed-forever, permanently losing their rows).
        Ingestion preserves the ORIGINAL ``paths`` order: the list is
        split into contiguous runs (conforming runs batched as one
        plan, divergent files per-file, in place), so id assignment
        (ids follow ingest order) and first-occurrence dedup
        attribution are identical to sequential process_file calls even
        when a divergent file sits mid-batch and shares row content
        with later files (review r9: ingesting divergent files FIRST
        reordered both). Asserted in tests against the sequential
        twin. Returned ``rows_loaded`` sums over all runs; ``status``
        is UPLOADED only if every non-empty run uploaded (else the
        first non-uploaded, non-empty status).

        CONCURRENCY: like :meth:`process_file`, this is a building block
        — it does not take the :class:`WriterLease` or run recovery.
        Callers outside :meth:`run` must hold the lease themselves (the
        write-id format is single-writer) and recover first.
        """
        from datawarehouse_backup_system_spark.sources.csv_source import (
            detect_delimiter,
            detect_encoding,
            read_header,
        )

        paths = [Path(p) for p in paths]
        if not paths:
            # total-function discipline: an empty listing is a no-op
            # cycle, not an IndexError (review r8)
            return FileResult("batch:[]", ledger_mod.STATUS_EMPTY,
                              error="empty batch")
        label = f"batch:{paths[0].name}..{paths[-1].name}[{len(paths)}]"
        handled: set = set()

        def _fold(results: list) -> tuple:
            """Shared status fold: bad → first bad, all EMPTY → EMPTY,
            else UPLOADED. One definition so the exception fallback
            cannot drift from the success path (ADVICE r10→r11: the
            fallback mapped all-EMPTY to UPLOADED)."""
            bad = [
                r for r in results
                if r.status not in (
                    ledger_mod.STATUS_UPLOADED, ledger_mod.STATUS_EMPTY
                )
            ]
            if bad:
                status = bad[0].status
            elif results and all(
                r.status == ledger_mod.STATUS_EMPTY for r in results
            ):
                status = ledger_mod.STATUS_EMPTY
            else:
                status = ledger_mod.STATUS_UPLOADED
            return status, bad

        results: list[FileResult] = []
        try:
            def _profile(p: Path) -> tuple:
                enc = detect_encoding(p) or "utf-8"
                delim = detect_delimiter(p, enc)
                return (enc, delim, tuple(read_header(p, enc, delim)))

            profiles = [_profile(p) for p in paths]
            golden = profiles[0]
            # contiguous runs in ORIGINAL order: (conforming?, paths)
            runs: list[tuple[bool, list[Path]]] = []
            for p, prof in zip(paths, profiles):
                ok = prof == golden
                if runs and runs[-1][0] == ok:
                    runs[-1][1].append(p)
                else:
                    runs.append((ok, [p]))
            for ok, run in runs:
                if ok:
                    run_label = (
                        f"batch:{run[0].name}..{run[-1].name}[{len(run)}]"
                    )
                    results.append(self._ingest(run, table_key, run_label))
                    handled.update(run)
                else:
                    # divergent profiles are ingested CORRECTLY one at a
                    # time under their own sniffed settings, in place;
                    # each ledgers its own outcome (they are valid
                    # files, just un-batchable). The caller's table_key
                    # overrides filename routing (review r9 — see
                    # process_file docstring).
                    for p in run:
                        results.append(
                            self.process_file(p, table_key=table_key)
                        )
                        handled.add(p)
            status, bad = _fold(results)
            return FileResult(
                label,
                status,
                rows_in=sum(r.rows_in for r in results),
                rows_loaded=sum(r.rows_loaded for r in results),
                error=bad[0].error if bad else None,
            )
        except Exception as exc:  # noqa: BLE001
            # batch-SCOPED failure (a profile read crashing, a
            # duplicate-basename/reserved-header ValueError from one
            # run): fall back to PER-FILE processing of everything not
            # yet handled — process_file is a total function that
            # ledgers each file's true outcome. The old mass-ledger of
            # STATUS_UNEXPECTED marked perfectly valid files
            # processed-forever (review r10: one bad sibling
            # permanently dropped the whole batch's rows). Re-ingesting
            # a file a partially-failed run already wrote is safe: the
            # cross-file history anti-join drops its rows as seen.
            # `results` still holds the pre-exception FileResults, so
            # their rows_in/rows_loaded are NOT dropped from the batch
            # accounting (ADVICE r10→r11).
            results = results + [
                self.process_file(p, table_key=table_key)
                for p in paths
                if p not in handled
            ]
            if not results:
                return FileResult(
                    label,
                    f"{ledger_mod.STATUS_UNEXPECTED}: {type(exc).__name__}",
                    error=str(exc),
                )
            status, bad = _fold(results)
            return FileResult(
                label,
                status,
                rows_in=sum(r.rows_in for r in results),
                rows_loaded=sum(r.rows_loaded for r in results),
                error=bad[0].error if bad else str(exc),
            )

    def run(self, input_dir: str | Path) -> list[FileResult]:
        """One cycle (reference main(), minus the daemon sleep — cadence is
        the scheduler's job, C4). Sequential per file, parity with the
        reference; :meth:`process_batch` is the many-files-one-scan scale
        path.

        The cycle holds the warehouse :class:`~.table_format.WriterLease`
        throughout: the write-id format is single-writer (module
        docstring of ``plans/table_format.py``), so a second concurrent
        ``run`` on the same warehouse raises ``ConcurrentWriterError``
        instead of silently interleaving ledger batches."""
        from datawarehouse_backup_system_spark.plans.table_format import (
            WriterLease,
        )

        with WriterLease(self.warehouse_dir) as lease:
            self.recover_writes()  # roll back any crashed append first
            processed = self.ledger.processed_set()
            results = []
            for f in discover_files(input_dir, processed):
                results.append(self.process_file(f))
                # heartbeat: a cycle longer than ttl_s would otherwise
                # look crashed to a waiting writer and get stolen
                lease.touch()
            return results
