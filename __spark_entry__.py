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

try:  # LLM-pipeline extension queries (dedup/similarity/text)
    from datawarehouse_backup_system_spark.queries import llm_ops

    _ALL_SPECS += list(llm_ops.SPECS)
except ImportError:
    pass

try:  # multimodal / recall / streaming-parity extension queries
    from datawarehouse_backup_system_spark.queries import extras

    _ALL_SPECS += list(extras.SPECS)
except ImportError:
    pass

try:  # round-4 curation extensions (line dedup, mixture, vocab, tfidf, SQ8)
    from datawarehouse_backup_system_spark.queries import curation_ext

    _ALL_SPECS += list(curation_ext.SPECS)
except ImportError:
    pass

try:  # behavioral analytics / PPS sampling / bloom join / PQ extensions
    from datawarehouse_backup_system_spark.queries import analytics_ext

    _ALL_SPECS += list(analytics_ext.SPECS)
except ImportError:
    pass

try:  # round-4 corpus extensions (CMS, SemDeDup, entropy, blocklist, PageRank)
    from datawarehouse_backup_system_spark.queries import corpus_ext

    _ALL_SPECS += list(corpus_ext.SPECS)
except ImportError:
    pass


def _last_green_round(name: str) -> int:
    """Latest driver round whose CORRECTNESS_r{N}.json has a green row.

    The driver verifies only the first 50 ``queries()`` entries per round,
    so we order specs least-recently-verified first (never-verified at the
    very front).  This is the rotation policy from COVERAGE.md: every
    query cycles through the verification window automatically, and newly
    added queries are verified in their first round.
    """
    best = -1
    for p in _REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd <= best:
            continue
        try:
            rows = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        row = rows.get(name)
        if not row or row.get("err") is not None:
            continue
        if row.get("rows_match") and row.get("schema_match") is not False \
                and row.get("hash_match") is not False:
            best = rnd
    return best


_BY_STALENESS = {s.name: i for i, s in enumerate(_ALL_SPECS)}
_ALL_SPECS.sort(key=lambda s: (_last_green_round(s.name), _BY_STALENESS[s.name]))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return as_query_dict(_ALL_SPECS)


def oracle_sql() -> dict[str, str]:
    return as_oracle_dict(_ALL_SPECS)
