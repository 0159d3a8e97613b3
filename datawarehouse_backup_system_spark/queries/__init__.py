"""Driver-contract query registry: Spark callables + DuckDB oracle SQL."""
