from __future__ import annotations

import pytest

from target_hdfs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="target_hdfs_spark_tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
