"""Subprocess worker for the cross-process writer-contention test.

Launched by ``test_two_process_ingest_cycles_single_winner``: builds its
OWN SparkSession (own JVM — this is the point: the threaded variant in
test_atomic_write.py shares one process, so it exercises the lease logic
but not the OS-level O_EXCL/rename claims the emulation rests on), signals
readiness, spin-waits for the shared "go" marker so both workers hit
``WriterLease.acquire`` within milliseconds, then runs one full
``IngestJob.run`` cycle and reports won/lost as JSON.

Reference analog: the single-writer daemon assumption (main.py:417-424) —
two independent daemon instances must never interleave one warehouse.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


def main() -> int:
    repo, data_dir, sync_dir, tag = sys.argv[1:5]
    sys.path.insert(0, repo)

    from datawarehouse_backup_system_spark.plans.ingest import IngestJob
    from datawarehouse_backup_system_spark.plans.table_format import (
        ConcurrentWriterError,
    )
    from datawarehouse_backup_system_spark.registry import SchemaRegistry
    from datawarehouse_backup_system_spark.session import get_spark
    from datawarehouse_backup_system_spark.sources.catalog import Router

    data = Path(data_dir)
    sync = Path(sync_dir)
    spark = get_spark(app_name=f"xproc-ingest-{tag}", shuffle_partitions=4)
    registry = SchemaRegistry.from_files(
        data / "table_schema.json", data / "rename_mapping.json"
    )
    router = Router().add(r"^last24h__", "mini_campaign_events")
    job = IngestJob(
        spark=spark,
        registry=registry,
        warehouse_dir=data / "warehouse",
        router=router,
    )

    (sync / f"ready-{tag}").touch()
    deadline = time.time() + 120
    while not (sync / "go").exists():
        if time.time() > deadline:
            (sync / f"out-{tag}.json").write_text(
                json.dumps({"outcome": "timeout"})
            )
            return 1
        time.sleep(0.005)

    try:
        res = job.run(data)
        out = {"outcome": "won", "statuses": [r.status for r in res]}
    except ConcurrentWriterError as exc:
        out = {"outcome": "lost", "err": str(exc)[:200]}
    (sync / f"out-{tag}.json").write_text(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
