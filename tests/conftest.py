import os
import shutil
import tempfile

import pytest

from fstore_sql_spark import EventStore, get_spark


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked @pytest.mark.slow (full tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r2 #4): the default run skips @slow
    (multiprocessing spawn suites, hypothesis property sweeps) for a
    fast iteration loop; ``pytest tests/ --runslow`` is the full
    pre-commit/CI tier.  (The stateful-streaming lifecycle tests were
    originally slow-tier candidates; after the chain_monitor
    AvailableNow fix they run in ~30 s and stay in the default tier.)"""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
