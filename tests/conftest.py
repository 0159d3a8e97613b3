"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from datawarehouse_backup_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: measured-slow tier (VERDICT r11 item 4): tests whose call time was
#: >=7 s in the r12 full-suite run live in slow_tests.txt and get the
#: ``slow`` marker here, so the default run (pytest.ini deselects
#: ``slow``) fits the driver's pytest window; the tier itself runs
#: in-session per round with ``-m slow``. Data-driven (one committed
#: list) instead of 73 scattered decorators; parametrized cases match
#: on the bracket-stripped name, so every param of a slow test is slow.
_SLOW_LIST = Path(__file__).parent / "slow_tests.txt"
_SLOW = {
    line.strip()
    for line in _SLOW_LIST.read_text().splitlines()
    if line.strip() and not line.startswith("#")
} if _SLOW_LIST.exists() else set()


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name.split('[')[0]}"
        if key in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="dwbss-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def load(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
