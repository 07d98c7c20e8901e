from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_mongo_watcher_spark.session import spark_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = spark_session(app_name="kmw-tests", cores=os.environ.get("KMW_TEST_CPUS", "8"),
                      shuffle_partitions=8)
    yield s
    s.stop()
