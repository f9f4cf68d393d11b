"""Shared SparkSession for the test suite (module-scoped singleton)."""

from __future__ import annotations

import pytest

from sage_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    session = build_spark(app_name="sage-spark-tests", master="local[4]", shuffle_partitions=4)
    yield session
    session.stop()
