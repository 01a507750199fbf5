from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def warehouse_dir():
    d = tempfile.mkdtemp(prefix="lakehouse-warehouse-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def spark(warehouse_dir):
    derby = tempfile.mkdtemp(prefix="derby-")
    spark = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": warehouse_dir,
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={derby}",
            "spark.ui.enabled": "false",
        },
    )
    yield spark
    spark.stop()
    shutil.rmtree(derby, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
