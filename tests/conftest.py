from __future__ import annotations

import pytest

from downloader_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Small parallelism: test-suite latency is dominated by task
    # scheduling overhead at sf0.001, not by compute.  8 local cores
    # (not 4): the whole-registry sweeps now drive keys from a driver
    # thread pool (tests/par.py), and 4 executor threads throttle the
    # overlapped jobs.
    s = get_spark(app="downloader-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
