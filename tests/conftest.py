import os
import shutil
import tempfile

import pytest

from fstore_sql_spark import EventStore, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fstore-tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def store(spark):
    path = tempfile.mkdtemp(prefix="fstore_test_")
    yield EventStore(spark, path)
    shutil.rmtree(path, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
