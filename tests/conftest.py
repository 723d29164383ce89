"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import tempfile

import pytest

from calorista_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="calorista-tests",
        master="local[4]",
        shuffle_partitions=8,
        # warehouse dir is a static conf — point managed (bucketed)
        # test tables at a throwaway location up front
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_")},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
