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
    # ONE builder shared with tools/plan_fingerprints.py: the fingerprint
    # snapshot must be taken under the exact session the suite runs on
    from quatrain_mapreduce_spark.planaudit import lint_session

    yield lint_session()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
