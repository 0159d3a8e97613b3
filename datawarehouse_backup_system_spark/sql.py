"""SQL surface: register the warehouse tables as temp views so every
query in this engine is reachable from ``spark.sql(...)``.

The reference exposes its tables to SQL consumers (SURVEY §2.7); the
Spark-native equivalent is temp-view registration over the same loaders
the DataFrame API uses — including the events ``ts`` normalization
(``queries.base.load``), so SQL users see the identical schema the
oracle-checked queries see. Views are lazy: registration costs a schema
read, not a scan, and Catalyst still prunes/pushes down through them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .queries.base import TABLES, load


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create (or replace) one temp view per warehouse table.

    ``prefix`` namespaces the views (e.g. ``sf001_``) when several scale
    factors are mounted in one session. Returns the registered names.
    """
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
