"""Golden-schema header validation against the REAL reference registry.

Reproduces the reference's exploratory notebook check (checkout_table.ipynb:
diff incoming CSV headers vs rename_mapping.json — its recorded run found
one extra header, 'SMTP response', at position 93) as deterministic
assertions through our P1/P3 validator. The reference files are read-only
data inputs here, not code.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from datawarehouse_backup_system_spark.operators.normalize import validate_headers
from datawarehouse_backup_system_spark.registry import SchemaRegistry

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference snapshot not mounted"
)


@pytest.fixture(scope="module")
def reg() -> SchemaRegistry:
    return SchemaRegistry.from_files(
        REF / "table_schema.json", REF / "rename_mapping.json"
    )


def test_rename_map_covers_exact_schema(reg):
    """A file carrying exactly the mapped raw headers validates cleanly."""
    for key in ("smallable_campaign_events", "smallable_contacts"):
        schema = reg.get(key)
        rename = reg.rename_map(key)
        raw_headers = list(rename.keys())
        report = validate_headers(raw_headers, schema.data_columns, rename)
        assert report.ok, (key, report.error)
        # every mapped target is a real schema column
        missing_targets = set(rename.values()) - set(schema.data_columns)
        assert not missing_targets, (key, missing_targets)


def test_notebook_extra_header_rejected(reg):
    """The notebook's production finding: an unmapped 'SMTP response'
    header makes the file over-wide -> rejected with the culprit named."""
    key = "smallable_campaign_events"
    schema = reg.get(key)
    rename = reg.rename_map(key)
    headers = list(rename.keys())
    if "SMTP response" not in rename:
        headers.append("SMTP response")
    report = validate_headers(headers, schema.data_columns, rename)
    if "SMTP response" in rename:
        assert report.ok  # mapping has since absorbed it
    else:
        assert not report.ok
        assert "SMTP response" in (report.error or "")


def test_duplicate_canonical_names_reject(reg):
    """A rename collision (two raw headers mapping to one canonical
    name) must fail validation on the ledger path, not crash
    normalize() later with AMBIGUOUS_REFERENCE (review r8)."""
    key = "smallable_contacts"
    schema = reg.get(key)
    rename = dict(reg.rename_map(key))
    first_canonical = schema.data_columns[0]
    rename["Some Extra Header"] = first_canonical
    headers = list(reg.rename_map(key).keys()) + ["Some Extra Header"]
    report = validate_headers(headers, schema.data_columns, rename)
    assert not report.ok
    assert "duplicate" in (report.error or "")


def test_missing_columns_warn_not_reject(reg):
    """Q4 asymmetry on the real schema: fewer columns -> ok + backfill."""
    key = "smallable_contacts"
    schema = reg.get(key)
    rename = reg.rename_map(key)
    headers = list(rename.keys())[:-5]
    report = validate_headers(headers, schema.data_columns, rename)
    assert report.ok
    assert len(report.missing_columns) >= 5
    assert report.warnings
