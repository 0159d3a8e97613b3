"""Schema registry: JSON table declarations → Spark ``StructType``.

The reference declares each target table in a JSON registry with ordered
``column_names`` + parallel ClickHouse ``column_types`` and per-type-class
column lists (reference ``table_schema.json:2-311``; loaded by
``util/data_pushing.py:168-185``). This module keeps that registry format
but resolves it to Spark types and makes two deliberate fixes (SURVEY §7):

- **exact-key lookup** instead of the reference's substring containment
  (``util/data_pushing.py:181-183``) — routing filename → table is a total
  function handled by ``sources.catalog``;
- the ``last_id`` watermark is *exported* metadata only; the source of
  truth at runtime is ``MAX(id)`` of the snapshot table itself (the
  reference's read-modify-write of the JSON file,
  ``util/data_pushing.py:430-460``, races under parallelism).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import types as T

# ClickHouse type string (reference registry values,
# table_schema.json:102-199) → Spark type. UInt64 narrows to LongType:
# ids are dense counters starting near 0, far below 2^63.
_CLICKHOUSE_TO_SPARK: dict[str, T.DataType] = {
    "UInt64": T.LongType(),
    "String": T.StringType(),
    "Nullable(String)": T.StringType(),
    "Nullable(DateTime)": T.TimestampType(),
    "Nullable(Int64)": T.LongType(),
    "Nullable(Float64)": T.DoubleType(),
    "Int64": T.LongType(),
    "Float64": T.DoubleType(),
    "DateTime": T.TimestampType(),
}

#: Columns that exist only post-load (engine-generated), never in raw files.
GENERATED_COLUMNS = ("id", "row_hash")


def spark_type_for(ch_type: str) -> T.DataType:
    try:
        return _CLICKHOUSE_TO_SPARK[ch_type]
    except KeyError:
        raise ValueError(f"unsupported registry type string: {ch_type!r}") from None


@dataclass(frozen=True)
class TableSchema:
    """One table's declaration, resolved from the JSON registry."""

    key: str                       # registry key, e.g. "smallable_campaign_events"
    table_name: str                # physical table name
    column_names: tuple[str, ...]  # ordered, includes id + row_hash
    column_types: tuple[str, ...]  # parallel ClickHouse type strings
    date_columns: tuple[str, ...] = ()
    int_columns: tuple[str, ...] = ()
    float_columns: tuple[str, ...] = ()
    string_columns: tuple[str, ...] = ()
    dob_columns: tuple[str, ...] = ()   # datetime-parsed, stored 'YYYY-MM-DD' string
    last_id: int = 0               # exported watermark (informational)

    def __post_init__(self) -> None:
        if len(self.column_names) != len(self.column_types):
            raise ValueError(
                f"{self.key}: {len(self.column_names)} column names vs "
                f"{len(self.column_types)} types"
            )
        # every type-class list must reference DECLARED columns (review
        # r10): a typo like int_columns=('amonut',) previously skipped
        # the cast silently, writing a string column where the schema
        # declares Long — lexicographic comparisons downstream and
        # dtype drift vs the empty-table fallback, with no error
        # anywhere. Fail fast at registry load instead.
        declared = set(self.column_names)
        for cls_name in (
            "date_columns", "int_columns", "float_columns",
            "string_columns", "dob_columns",
        ):
            unknown = sorted(set(getattr(self, cls_name)) - declared)
            if unknown:
                raise ValueError(
                    f"{self.key}: {cls_name} references undeclared "
                    f"column(s) {unknown} (declared: "
                    f"{sorted(declared)})"
                )

    @property
    def data_columns(self) -> tuple[str, ...]:
        """Schema order minus engine-generated columns — what a raw file carries."""
        return tuple(c for c in self.column_names if c not in GENERATED_COLUMNS)

    def to_struct_type(self) -> T.StructType:
        """Full typed output schema. Everything nullable except id/row_hash
        (reference nullability: table_schema.json:103,198)."""
        return T.StructType(
            [
                T.StructField(n, spark_type_for(t), nullable=n not in GENERATED_COLUMNS)
                for n, t in zip(self.column_names, self.column_types)
            ]
        )

    def raw_struct_type(self) -> T.StructType:
        """All-string schema for the initial CSV read (schema-on-read parity
        with the reference's ``dtype=str`` pass, data_processing.py:173)."""
        return T.StructType(
            [T.StructField(n, T.StringType(), True) for n in self.data_columns]
        )


@dataclass
class SchemaRegistry:
    """Exact-match registry of :class:`TableSchema` + per-table rename maps."""

    tables: dict[str, TableSchema] = field(default_factory=dict)
    rename_maps: dict[str, dict[str, str]] = field(default_factory=dict)

    @classmethod
    def from_files(
        cls, schema_path: str | Path, rename_path: str | Path | None = None
    ) -> "SchemaRegistry":
        reg = cls()
        raw = json.loads(Path(schema_path).read_text())
        for key, decl in raw.items():
            reg.tables[key] = TableSchema(
                key=key,
                table_name=decl["table_name"],
                column_names=tuple(decl["column_names"]),
                column_types=tuple(decl["column_types"]),
                date_columns=tuple(decl.get("date_columns", ())),
                int_columns=tuple(decl.get("int_columns", ())),
                float_columns=tuple(decl.get("float_columns", ())),
                string_columns=tuple(decl.get("string_columns", ())),
                dob_columns=tuple(decl.get("dob_columns", ())),
                last_id=int(decl.get("last_id", 0)),
            )
        if rename_path is not None:
            reg.rename_maps = json.loads(Path(rename_path).read_text())
        return reg

    def get(self, key: str) -> TableSchema:
        try:
            return self.tables[key]
        except KeyError:
            raise KeyError(
                f"no schema registered for {key!r}; known: {sorted(self.tables)}"
            ) from None

    def rename_map(self, key: str) -> dict[str, str]:
        return self.rename_maps.get(key, {})
