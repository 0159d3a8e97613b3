"""datawarehouse_backup_system_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL/backup daemon (``Panhayuthh/datawarehouse-backup-system``),
re-expressed Spark-first:

- the reference's CSV→normalize→dedup→typed-load pipeline becomes one lazy
  DataFrame plan (scan → rename → casts → row_hash → dedup anti-joins →
  id assignment → snapshot write), optimized by Catalyst/AQE;
- its hand-rolled hash-set semi/anti joins become real Spark joins
  (broadcast when small, shuffled otherwise);
- its per-table JSON schema registry maps onto ``StructType``;
- beyond the reference surface, large-scale LLM-data-pipeline operators
  (exact + approximate dedup, similarity search, text analysis, multimodal
  column plumbing) are first-class.

Everything is designed for a multi-executor cluster at ~100 TB scale and
verified for correctness on small scale factors against a DuckDB oracle.
"""

from datawarehouse_backup_system_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
