"""Shared SparkSession for the test suite (session-scoped, local[4])."""

from __future__ import annotations

import pytest

from pyanomalydetector2_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=4, app_name="pyad2-tests", shuffle_partitions=8)
    yield s
    s.stop()
