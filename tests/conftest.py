"""Shared test fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlframwork_spark.session import build_session  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]", app_name="etlframwork-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
