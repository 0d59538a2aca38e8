from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from delta_sharing_spark import get_spark

    return get_spark(app_name="dss_tests", cpus=8)


@pytest.fixture(scope="session")
def events(spark):
    from delta_sharing_spark.io import read_table

    return read_table(spark, SF_DIR, "events")


@pytest.fixture(scope="session")
def lineitem(spark):
    from delta_sharing_spark.io import read_table

    return read_table(spark, SF_DIR, "lineitem")


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "table")
