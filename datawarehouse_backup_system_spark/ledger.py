"""Processing ledger: the idempotency/audit table.

The reference keeps ``processed_files(file_name, status, created_at)`` in
Postgres (S12/S13, ``util/data_pushing.py:490-592``) and loads it into a
Python set for membership tests (``main.py:349-350,364``). Here it is a
tiny append-only parquet table; membership at scale is an anti-join, and
the driver-side ``processed_set()`` remains for file routing (the listing
is O(files), never O(rows)).

Status strings preserve the reference's vocabulary (21 distinct statuses,
SURVEY §5) — e.g. ``'processed'``, ``'uploaded to ClickHouse'``,
``'no schema found'``, ``'column count mismatch'``.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# The reference's full 20-string status vocabulary (every literal passed
# to insert_processed_file across main.py + util/). Statuses whose stage
# exists distinctly in this engine are wired into the ingest paths; the
# per-stage pandas errors (rename / add column / self dedup / cross-file
# comparison and their 'critical' variants) cannot occur separately here
# because those stages collapse into ONE lazy Catalyst plan — any failure
# in that plan surfaces at write time as STATUS_INSERT_ERROR (or
# STATUS_COLUMN_MISMATCH, which is validated pre-plan). Kept as constants
# for diagnostics parity with reference dashboards.
STATUS_PROCESSED = "processed"
STATUS_UPLOADED = "uploaded to ClickHouse"
STATUS_NO_SCHEMA = "no schema found"
STATUS_NO_RENAME_MAP = "no column mapping found"
STATUS_COLUMN_MISMATCH = "column count mismatch"
STATUS_NOT_CSV = "not a valid CSV file"
STATUS_EXTRACTION_FAILED = "extraction failed"
STATUS_EXTRACTION_CRITICAL = "critical extraction error"
STATUS_RENAME_ERROR = "rename error"
STATUS_RENAME_CRITICAL = "critical rename error"
STATUS_ADD_COLUMN_ERROR = "add column error"
STATUS_ADD_COLUMN_CRITICAL = "critical add column error"
STATUS_SELF_DEDUP_ERROR = "self deduplication error"
STATUS_SELF_DEDUP_CRITICAL = "critical self deduplication error"
STATUS_CROSSFILE_ERROR = "cross-file comparison error"
STATUS_CROSSFILE_CRITICAL = "critical cross-file comparison error"
STATUS_INSERT_ERROR = "insert error"
STATUS_UPLOAD_ERROR = "upload error"
STATUS_LAST_ID_ERROR = "update last_id error"
STATUS_EMPTY = "empty file"
STATUS_UNEXPECTED = "unexpected error"

# -- write-id transaction markers (snapshot append atomicity) -------------
# A snapshot append is bracketed by ledger rows named "_write:<table>:<id>"
# so a mid-write crash is detectable and rollbackable (begin without
# commit → recover_writes deletes that write-id's files).
WRITE_MARKER_PREFIX = "_write:"
STATUS_WRITE_BEGIN = "write begin"
STATUS_WRITE_COMMIT = "write commit"
STATUS_WRITE_ABORTED = "write aborted"
# RESTORE tombstone: a committed write logically removed by
# restore_to_version. Excluded from committed_writes (so time travel and
# live reads no longer see it); its data files become vacuum()-able.
STATUS_WRITE_RESTORED = "write restored-away"


class Ledger:
    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = str(path)

    def append(self, file_name: str, status: str) -> None:
        self.append_many([(file_name, status)])

    def append_many(
        self, rows: list[tuple[str, str]], cas_token: str | None = None
    ) -> bool:
        """Write several (file_name, status) rows as ONE parquet file —
        the closest thing the format has to an atomic multi-row commit:
        the file appears whole or not at all, so a composite transition
        (e.g. OPTIMIZE's 'commit new write-id + tombstone the ids it
        replaces') can never be observed half-applied.

        Via pandas/Arrow (a ``createDataFrame(list)`` local relation
        spreads rows over defaultParallelism slices and walking 32
        mostly-empty slices measured 4 s per marker write vs 0.35 s this
        way) PLUS an explicit ``coalesce(1)``: the Arrow path still
        splits a multi-row batch into up to one partition PER ROW, and
        one file per row would void the whole-or-nothing visibility this
        method exists for (review r7 — verified 3 rows → 3 files
        without it; with it, 1 file, and faster). The coalesce only
        walks the ≤ len(rows) non-empty Arrow slices, so the old
        32-empty-slice objection does not apply.

        ``cas_token``: put-if-absent commit (the Delta commit-log
        shape, r8). The batch is staged next to the ledger and
        HARD-LINKED in under ``cas-{token}.parquet`` — link is atomic
        and fails EEXIST if a batch for the same token already landed,
        so exactly ONE caller per token ever commits; the link IS the
        commit, so a crash leaves either nothing (retryable) or the
        whole batch. Returns True if this call committed, False if the
        token was already taken (the caller rolls back its write).
        """
        if not rows:
            if cas_token is not None:
                # an empty CAS batch cannot consume the token — two
                # racers would both "win" and a later non-empty batch
                # for the same token would also land (review r8)
                raise ValueError(
                    "append_many: cas_token requires a non-empty batch"
                )
            return True
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["file_name", "status"])
        df = self.spark.createDataFrame(pdf).withColumn(
            "created_at", F.current_timestamp()
        )
        if cas_token is None:
            df.coalesce(1).write.mode("append").parquet(self.path)
            return True
        import os
        import shutil
        import uuid as _uuid

        target = Path(self.path) / f"cas-{cas_token}.parquet"
        if target.exists():
            return False
        # stage as a SIBLING of the ledger dir ("_"-prefixed: invisible
        # to table readers) so os.link stays on one filesystem. A
        # SIGKILL between the staging write and the link strands the
        # stage dir (no finally runs), so sweep siblings old enough
        # that no live commit could still own them (review r8 — the
        # crashed-run-strands-scratch class, in a dir the /tmp sweep
        # never visits).
        import time as _time

        now = _time.time()
        for stray in Path(self.path).parent.glob("_ledger_stage-*"):
            try:
                if now - stray.stat().st_mtime > 86_400:
                    shutil.rmtree(stray, ignore_errors=True)
            except OSError:
                pass
        staging = (
            Path(self.path).parent / f"_ledger_stage-{_uuid.uuid4().hex[:8]}"
        )
        try:
            df.coalesce(1).write.mode("overwrite").parquet(str(staging))
            part = next(staging.glob("part-*.parquet"))
            Path(self.path).mkdir(parents=True, exist_ok=True)
            try:
                os.link(part, target)
            except FileExistsError:
                return False
            return True
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _exists(self) -> bool:
        p = Path(self.path)
        return p.exists() and any(p.glob("*.parquet"))

    def read(self) -> DataFrame:
        """S13: the full ledger."""
        if not self._exists():
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)

    def processed_set(self) -> set[str]:
        """Driver-side membership set for file routing (reference
        main.py:350). Stays O(#files); write-id transaction markers are
        internal bookkeeping, not landing files."""
        return {
            r["file_name"]
            for r in self.read().select("file_name").distinct().collect()
            if not r["file_name"].startswith(WRITE_MARKER_PREFIX)
        }

    def incomplete_writes(self) -> list[tuple[str, str]]:
        """(table_name, write_id) pairs whose begin marker has no commit
        and no aborted marker — the rollback set for recover_writes."""
        rows = (
            self.read()
            .where(F.col("file_name").startswith(WRITE_MARKER_PREFIX))
            .groupBy("file_name")
            .agg(F.collect_set("status").alias("states"))
            .collect()
        )
        out = []
        for r in rows:
            states = set(r["states"])
            if STATUS_WRITE_BEGIN in states and not (
                {STATUS_WRITE_COMMIT, STATUS_WRITE_ABORTED} & states
            ):
                _, table_name, write_id = r["file_name"].split(":", 2)
                out.append((table_name, write_id))
        return out

    def committed_writes(self, table_name: str) -> list[tuple[str, object]]:
        """(write_id, committed_at) for every COMMITTED snapshot append
        of ``table_name`` not tombstoned by a restore, ordered by commit
        time (ties by id) — the version history time travel reads from."""
        rows = (
            self.read()
            .where(
                F.col("file_name").startswith(
                    f"{WRITE_MARKER_PREFIX}{table_name}:"
                )
            )
            .groupBy("file_name")
            .agg(
                F.collect_set("status").alias("states"),
                F.min(
                    F.when(
                        F.col("status") == STATUS_WRITE_COMMIT,
                        F.col("created_at"),
                    )
                ).alias("committed_at"),
            )
            .collect()
        )
        out = [
            (r["file_name"].rsplit(":", 1)[-1], r["committed_at"])
            for r in rows
            if STATUS_WRITE_COMMIT in set(r["states"])
            and STATUS_WRITE_RESTORED not in set(r["states"])
        ]
        return sorted(out, key=lambda t: (t[1], t[0]))

    def ever_committed_writes(self, table_name: str) -> set[str]:
        """write_ids that carry a COMMIT marker, INCLUDING those later
        tombstoned by restore/rewrite — the replay-idempotency set for
        exactly-once sinks: a batch whose id ever committed is durably in
        the table's lineage (a rewrite carried its rows forward), so a
        replay must stay a no-op even though committed_writes() no
        longer lists the id."""
        rows = (
            self.read()
            .where(
                F.col("file_name").startswith(
                    f"{WRITE_MARKER_PREFIX}{table_name}:"
                )
            )
            .groupBy("file_name")
            .agg(F.collect_set("status").alias("states"))
            .collect()
        )
        return {
            r["file_name"].rsplit(":", 1)[-1]
            for r in rows
            if STATUS_WRITE_COMMIT in set(r["states"])
        }

    def tombstoned_writes(self, table_name: str) -> list[str]:
        """write_ids of ``table_name`` carrying a restore tombstone, or
        an abort marker with NO commit — the set whose lingering data
        files vacuum() may safely delete (an unknown/in-progress
        write-id is NOT in this list, so vacuum can never race a
        concurrent publish).

        ABORTED alone is not enough (review r11): the exactly-once
        streaming sink's documented abort-then-replay flow re-appends
        the SAME deterministic write-id after a failed epoch, so its
        state set is {begin, aborted, begin, commit} — a LIVE committed
        write that the old any-abort rule let vacuum() delete (silent
        data loss, then PATH_NOT_FOUND on time travel). A later COMMIT
        supersedes an earlier abort; RESTORED always tombstones (it
        retires a commit by design)."""
        rows = (
            self.read()
            .where(
                F.col("file_name").startswith(
                    f"{WRITE_MARKER_PREFIX}{table_name}:"
                )
            )
            .groupBy("file_name")
            .agg(F.collect_set("status").alias("states"))
            .collect()
        )
        out = []
        for r in rows:
            states = set(r["states"])
            if STATUS_WRITE_RESTORED in states or (
                STATUS_WRITE_ABORTED in states
                and STATUS_WRITE_COMMIT not in states
            ):
                out.append(r["file_name"].rsplit(":", 1)[-1])
        return out
