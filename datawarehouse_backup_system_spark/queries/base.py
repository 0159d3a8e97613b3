"""Query-spec plumbing for the driver contract.

Each :class:`QuerySpec` pairs an idiomatic-Spark callable with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables. The
driver compares row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- double-typed aggregates are either summed exactly via DECIMAL and cast
  back, or rounded to a fixed number of decimals on BOTH sides (FP
  summation order differs between engines; never hash an unrounded
  float aggregate);
- LIMIT/top-k queries always order by a unique tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The driver runs these under ITS OWN SparkSession; pin the session
    # timezone so timestamp literals / date_format render identically to
    # DuckDB's naive-UTC regardless of the host session's defaults.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        # events.parquet has shipped with two physical ts encodings across
        # testdata generations: TIMESTAMP(NANOS) (which Spark's vectorized
        # reader rejects — read nanos as long, truncate to micros like
        # DuckDB) and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false
        # (which Spark reads as TIMESTAMP_NTZ). Decide from the parquet
        # FOOTER (review r8: unconditionally flipping the session-wide
        # legacy.parquet.nanosAsLong flag made every LATER parquet read
        # in the session silently decode nanos timestamps as BIGINT);
        # the flag is touched only for a nanos-generation file, where
        # it is the documented requirement for the session.
        path = f"{sf_dir}/{table}.parquet"
        try:
            import pyarrow.parquet as _pq

            import pyarrow as _pa

            # precise type check, not a substring probe: a micros
            # timestamp whose TZ NAME contains 'ns' (e.g.
            # 'Europe/Athens') would otherwise flip the session-wide
            # nanosAsLong flag and truncate every ts 1000× (review r9)
            _t = _pq.read_schema(path).field("ts").type
            _is_nanos = isinstance(_t, _pa.TimestampType) and _t.unit == "ns"
        except Exception:  # noqa: BLE001 — probe with Spark below
            # unknown footer (no pyarrow / unreadable): do NOT assume
            # nanos — that set the session-wide flag for micros files
            # and re-created the r8 session-poisoning bug this branch
            # exists to avoid (review r8). Try the plain read; only a
            # genuine nanos file raises, and only then flip the flag.
            _is_nanos = None
        if _is_nanos:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if _is_nanos is None:
            try:
                df = spark.read.parquet(path)
            except Exception:  # noqa: BLE001 — possibly nanos rejection
                _flag = "spark.sql.legacy.parquet.nanosAsLong"
                _prior = spark.conf.get(_flag, None)
                spark.conf.set(_flag, "true")
                try:
                    df = spark.read.parquet(path)
                except Exception:
                    # the failure was NOT a nanos rejection (missing
                    # path, corrupt footer): restore the flag so the
                    # session isn't left poisoned for later genuine
                    # nanos reads (review r8)
                    if _prior is None:
                        spark.conf.unset(_flag)
                    else:
                        spark.conf.set(_flag, _prior)
                    raise
        else:
            df = spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            # Session tz is pinned to UTC above, so NTZ -> TZ preserves the
            # wall-clock instant and matches DuckDB's naive reading.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None   # None → driver records a weaker rows-only check
    doc: str = ""


def as_query_dict(specs: list[QuerySpec]) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.spark_fn for s in specs}


def as_oracle_dict(specs: list[QuerySpec]) -> dict[str, str]:
    return {s.name: s.oracle for s in specs if s.oracle is not None}
