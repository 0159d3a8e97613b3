"""Composed end-to-end plans (the reference's entry points, Spark-first)."""
