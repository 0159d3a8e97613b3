"""Relational + pipeline operators (SURVEY §2 re-expressed Spark-first)."""
