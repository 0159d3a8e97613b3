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

try:  # pipeline extensions (dup spans, DSIR, leakage split, domain cap, LR)
    from datawarehouse_backup_system_spark.queries import pipeline_ext

    _ALL_SPECS += list(pipeline_ext.SPECS)
except ImportError:
    pass

try:  # scale extensions (prefix-filter join, quantile sketch, SCD2 PIT, Q17)
    from datawarehouse_backup_system_spark.queries import scale_ext

    _ALL_SPECS += list(scale_ext.SPECS)
except ImportError:
    pass

try:  # round-6 extensions (incremental view, bloom index, skyline, EWMA,
    # conformal, log2 histogram)
    from datawarehouse_backup_system_spark.queries import round6_ext

    _ALL_SPECS += list(round6_ext.SPECS)
except ImportError:
    pass

try:  # round-7 extensions (frequent-pattern co-occurrence mining)
    from datawarehouse_backup_system_spark.queries import round7_ext

    _ALL_SPECS += list(round7_ext.SPECS)
except ImportError:
    pass

try:  # round-8 extensions (large-star/small-star connected components)
    from datawarehouse_backup_system_spark.queries import round8_ext

    _ALL_SPECS += list(round8_ext.SPECS)
except ImportError:
    pass

try:  # round-9 extensions (k-core decomposition)
    from datawarehouse_backup_system_spark.queries import round9_ext

    _ALL_SPECS += list(round9_ext.SPECS)
except ImportError:
    pass

try:  # round-10 extensions (HyperBall tolerance spec, dup-span removal)
    from datawarehouse_backup_system_spark.queries import round10_ext

    _ALL_SPECS += list(round10_ext.SPECS)
except ImportError:
    pass

try:  # round-11 extensions (Cavnar-Trenkle character-n-gram langid)
    from datawarehouse_backup_system_spark.queries import round11_ext

    _ALL_SPECS += list(round11_ext.SPECS)
except ImportError:
    pass


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
    for p in _REPO.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
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
