import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datamatch_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="datamatch-spark-tests",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.ui.retainedExecutions": "5"},
    )
    yield s
