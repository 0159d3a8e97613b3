"""Registry + session smoke tests."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from datawarehouse_backup_system_spark.registry import SchemaRegistry, TableSchema

MINI_REGISTRY = {
    "mini_events": {
        "table_name": "mini_campaign_events",
        "column_names": ["id", "email", "event_datetime", "number_of_children",
                         "total_order_amount_eur", "date_of_birth", "row_hash"],
        "column_types": ["UInt64", "Nullable(String)", "Nullable(DateTime)",
                         "Nullable(Int64)", "Nullable(Float64)",
                         "Nullable(String)", "String"],
        "date_columns": ["event_datetime"],
        "int_columns": ["number_of_children"],
        "float_columns": ["total_order_amount_eur"],
        "string_columns": ["email"],
        "dob_columns": ["date_of_birth"],
        "last_id": 42,
    }
}


def test_registry_roundtrip(tmp_path):
    p = tmp_path / "table_schema.json"
    p.write_text(json.dumps(MINI_REGISTRY))
    reg = SchemaRegistry.from_files(p)
    ts = reg.get("mini_events")
    assert ts.table_name == "mini_campaign_events"
    assert ts.last_id == 42
    assert ts.data_columns == ("email", "event_datetime", "number_of_children",
                               "total_order_amount_eur", "date_of_birth")

    st = ts.to_struct_type()
    assert st["id"].dataType == T.LongType() and not st["id"].nullable
    assert st["row_hash"].dataType == T.StringType() and not st["row_hash"].nullable
    assert st["event_datetime"].dataType == T.TimestampType()
    assert st["number_of_children"].dataType == T.LongType()
    assert st["total_order_amount_eur"].dataType == T.DoubleType()
    # DOBs stay string (reference stores 'YYYY-MM-DD' strings,
    # table_schema.json:130, data_pushing.py:368-370)
    assert st["date_of_birth"].dataType == T.StringType()

    raw = ts.raw_struct_type()
    assert all(f.dataType == T.StringType() for f in raw.fields)
    assert "id" not in raw.fieldNames() and "row_hash" not in raw.fieldNames()


def test_exact_match_lookup_rejects_substring():
    ts = TableSchema(key="k", table_name="t", column_names=("id", "row_hash"),
                     column_types=("UInt64", "String"))
    reg = SchemaRegistry(tables={"k": ts})
    assert reg.get("k") is ts
    try:
        reg.get("k_longer")  # the reference would substring-match here (Q1/S14)
    except KeyError:
        pass
    else:
        raise AssertionError("substring lookup must not succeed")


def test_spark_session_confs(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.range(5).count() == 5
