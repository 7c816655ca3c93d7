"""Shared pytest fixtures.

One SparkSession per test session (startup is ~20 s — amortize it), built
WITHOUT the engine's conf extras wherever that matters: catalog/stream code
must work on a plain session (the driver harness builds its own), so the
fixture deliberately mirrors the harness, not get_spark().
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        .appName("qms-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
