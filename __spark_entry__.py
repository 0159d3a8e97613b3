"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (+ LLM-pipeline extensions);
``oracle_sql()`` gives the DuckDB-equivalent SQL per query.
"""

from __future__ import annotations

import json
import re
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

from datawarehouse_backup_system_spark.queries import relational, relational_ext  # noqa: E402
from datawarehouse_backup_system_spark.queries.base import (  # noqa: E402
    as_oracle_dict,
    as_query_dict,
)

_ALL_SPECS = list(relational.SPECS) + list(relational_ext.SPECS)

# Extension spec modules load LOUDLY (review r11): the old per-module
# `except ImportError: pass` meant a genuine import error (renamed
# helper, broken transitive import) silently deleted that module's
# whole spec family from queries()/oracle_sql() — the gate then went
# green over the shrunken contract. None of these modules is optional.
import importlib  # noqa: E402

for _mod in (
    "llm_ops",
    "extras",
    "curation_ext",
    "analytics_ext",
    "corpus_ext",
    "pipeline_ext",
    "scale_ext",
    "round6_ext",
    "round7_ext",
    "round8_ext",
    "round9_ext",
    "round10_ext",
    "round11_ext",
):
    _ALL_SPECS += list(
        importlib.import_module(
            f"datawarehouse_backup_system_spark.queries.{_mod}"
        ).SPECS
    )

# duplicate spec names would dedupe last-wins inside as_query_dict and
# silently drop the earlier query from ALL verification (review r11) —
# fail at import, where the collision was introduced
_seen: dict[str, int] = {}
for _s in _ALL_SPECS:
    _seen[_s.name] = _seen.get(_s.name, 0) + 1
_dups = sorted(n for n, c in _seen.items() if c > 1)
if _dups:
    raise ValueError(f"duplicate spec name(s) in the contract: {_dups}")


_HISTORY_CACHE: list[tuple[int, dict]] | None = None


def _correctness_history() -> list[tuple[int, dict]]:
    """All CORRECTNESS_r*.json files parsed ONCE per process (review
    r11: the per-spec sort key re-globbed and re-parsed every file for
    every spec — O(specs × rounds) JSON parses on every import of this
    module by every tool)."""
    global _HISTORY_CACHE
    if _HISTORY_CACHE is None:
        out = []
        for p in _REPO.glob("CORRECTNESS_r*.json"):
            m = re.search(r"r(\d+)", p.name)
            if not m:
                continue
            try:
                out.append((int(m.group(1)), json.loads(p.read_text())))
            except (OSError, json.JSONDecodeError):
                continue
        _HISTORY_CACHE = out
    return _HISTORY_CACHE


def _staleness_key(name: str) -> int:
    """Rotation priority from the CORRECTNESS_r{N}.json history.

    The driver verifies only the first 50 ``queries()`` entries per round,
    so we order specs by verification urgency (COVERAGE.md policy):

    - **-2**: the MOST RECENT round that checked this query recorded an
      error or a mismatch — a red row is worse than no row, so these
      re-enter the window ahead of everything (e.g. the round-3 events
      queries that crashed on the regenerated testdata schema: the fix
      must be proven in the very next round, not after the backlog).
    - **-1**: never checked by any round.
    - **N ≥ 0**: last green round — least-recently-confirmed first.

    Ties keep the original spec order, so rotation is deterministic.
    """
    last_green = -1
    latest_seen = -1
    latest_red = False
    for rnd, rows in _correctness_history():
        row = rows.get(name)
        if not row:
            continue
        green = (
            row.get("err") is None
            and row.get("rows_match")
            and row.get("schema_match") is not False
            and row.get("hash_match") is not False
        )
        if rnd > latest_seen:
            latest_seen = rnd
            latest_red = not green
        if green and rnd > last_green:
            last_green = rnd
    if latest_red:
        return -2
    return last_green


_BY_STALENESS = {s.name: i for i, s in enumerate(_ALL_SPECS)}
_ALL_SPECS.sort(key=lambda s: (_staleness_key(s.name), _BY_STALENESS[s.name]))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return as_query_dict(_ALL_SPECS)


def oracle_sql() -> dict[str, str]:
    return as_oracle_dict(_ALL_SPECS)
