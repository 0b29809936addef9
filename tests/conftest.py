from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("QUACKML_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from quackml_spark.session import get_spark

    cores = os.environ.get("QUACKML_TEST_CPUS", "8")
    s = get_spark(
        app_name="quackml-tests",
        master=f"local[{cores}]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/qml-wh"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from quackml_spark.testing import duckdb_connection

    return duckdb_connection(sf_dir)
