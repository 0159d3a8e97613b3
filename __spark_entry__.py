"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2 (+ LLM-pipeline extensions);
``oracle_sql()`` gives the DuckDB-equivalent SQL per query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return as_query_dict(_ALL_SPECS)


def oracle_sql() -> dict[str, str]:
    return as_oracle_dict(_ALL_SPECS)
