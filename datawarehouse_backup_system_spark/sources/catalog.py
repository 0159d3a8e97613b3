"""File discovery + filename→table routing.

Covers S1 (listing scan, reference ``main.py:353-361``) and P4 (filename
predicates, ``main.py:364,112-113``), with SURVEY decision D4: routing is a
**total function**. The reference only assigns ``table_name`` when the file
starts with ``last24h__`` and crashes with UnboundLocalError otherwise
(quirk Q1, ``main.py:111-116``); here unknown files resolve to None and the
caller records ledger status ``'no schema found'``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

DATA_SUFFIXES = (".csv", ".zip", ".gz")


@dataclass
class Router:
    """Ordered (regex → registry key) rules; first match wins."""

    rules: list[tuple[re.Pattern, str]] = field(default_factory=list)

    def add(self, pattern: str, table_key: str) -> "Router":
        self.rules.append((re.compile(pattern), table_key))
        return self

    def route(self, file_name: str) -> str | None:
        name = Path(file_name).name
        for pat, key in self.rules:
            if pat.search(name):
                return key
        return None


def default_router() -> Router:
    """The production routing the reference implies: ``last24h__*`` exports
    are campaign events (main.py:111-116); contacts exports carry the table
    name in the filename."""
    return (
        Router()
        .add(r"^last24h__", "smallable_campaign_events")
        .add(r"contacts", "smallable_contacts")
    )


def discover_files(input_dir: str | Path, processed: set[str] | None = None) -> list[Path]:
    """List candidate data files, newest last (stable name order), skipping
    names already in the processed ledger (reference main.py:349-364).

    Local-dir flavor for tests; on a cluster the same predicate set applies
    to an object-store listing (s3a:// glob) — Spark lists natively, and the
    already-processed check becomes an anti-join against the ledger table
    when the listing itself is large.
    """
    processed = processed or set()
    # is_file(): a DIRECTORY named 'export.csv' would otherwise enter the
    # pipeline, fail with IsADirectoryError, and — because ledgered names
    # are skipped forever — permanently blacklist the real file's name
    files = sorted(
        p
        for p in Path(input_dir).iterdir()
        if p.suffix.lower() in DATA_SUFFIXES
        and p.name not in processed
        and p.is_file()
    )
    return files
