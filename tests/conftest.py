from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECTNESS = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from realtimedatawarehouse_self_spark.session import get_spark

    spark = get_spark(
        app_name="rtdw-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def pytest_collection_modifyitems(config, items):
    """Default-skip items marked `exhaustive` (see pytest.ini) unless
    SPARK_GRAFT_FULL_TESTS=1. The driver's budgeted `pytest tests/ -x -q`
    then completes; the full sweep stays one env var away and is run as
    the end-of-round seal."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="exhaustive sweep — set SPARK_GRAFT_FULL_TESTS=1"
    )
    for item in items:
        if "exhaustive" in item.keywords:
            item.add_marker(skip)
