"""Export sinks: cleaned-snapshot CSV handoff and watermark write-back.

S10/S11 parity — the reference re-publishes each cleaned CSV under
``processed/{table}/`` for downstream file consumers
(``/root/reference/main.py:296-305``); here the snapshot table IS the
cleaned data (design D1), so the exporter renders it back to CSV on
demand instead of keeping a second copy on every ingest.

Watermark write-back — the reference read-modify-writes ``last_id`` into
the registry JSON after each load (``util/data_pushing.py:430-460``).
The engine keeps the snapshot's ``MAX(id)`` as the runtime source of
truth (that read-modify-write races under parallelism), but exports an
updated registry copy so reference-format tooling round-trips cleanly.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame


def export_snapshot_csv(
    df: DataFrame,
    out_dir: str | Path,
    single_file: bool = False,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss.SSSSSS",
) -> Path:
    """Write a snapshot DataFrame as headered CSV under ``out_dir``.

    Distributed multi-part by default (the 100 TB shape: one file per
    partition, no driver funnel). ``single_file=True`` coalesces to one
    partition for reference-style one-file-per-table handoff — only for
    ops-plane/small exports, the coalesce serializes the write.
    The default timestamp format keeps microsecond precision so the
    handoff is lossless (snapshot timestamps are µs).
    Returns the output directory path.
    """
    out_dir = Path(out_dir)
    w = df.coalesce(1) if single_file else df
    (
        w.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", timestamp_format)
        .csv(str(out_dir))
    )
    return out_dir


def export_registry_watermarks(
    schema_path: str | Path,
    out_path: str | Path,
    last_ids: dict[str, int],
) -> Path:
    """Copy the registry JSON with ``last_id`` updated per table key.

    Unknown keys in ``last_ids`` raise; declaration fields other than
    ``last_id`` pass through byte-for-byte-equivalent (the export must
    remain loadable by reference-format tooling). The live engine never
    reads this back — snapshot ``MAX(id)`` stays authoritative.
    """
    raw = json.loads(Path(schema_path).read_text())
    unknown = set(last_ids) - set(raw)
    if unknown:
        raise KeyError(f"last_ids for unregistered tables: {sorted(unknown)}")
    for key, last_id in last_ids.items():
        raw[key]["last_id"] = int(last_id)
    out_path = Path(out_path)
    out_path.write_text(json.dumps(raw, indent=2))
    return out_path


def export_snapshot_jsonl(
    df: DataFrame,
    out_dir: str | Path,
    compression: str | None = "gzip",
    single_file: bool = False,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
) -> Path:
    """Write a snapshot as line-delimited JSON under ``out_dir`` — the
    interchange format downstream training pipelines ingest (the sink
    twin of ``sources.jsonl_source``; a round-trip through both is
    lossless for the registry's scalar types).

    Distributed multi-part by default, gzip-compressed (JSONL is
    verbose; .gz parts stay splittable at the FILE level, which is the
    parallelism unit here — one writer/reader task per part). ISO-8601
    timestamps with µs and offset so readers need no format contract.
    """
    out_dir = Path(out_dir)
    w = df.coalesce(1) if single_file else df
    writer = w.write.mode("overwrite").option(
        "timestampFormat", timestamp_format
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(str(out_dir))
    return out_dir
