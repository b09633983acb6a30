from __future__ import annotations

import tempfile

import pytest

from target_hdfs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="spark_warehouse_")
    s = get_spark(
        app_name="target_hdfs_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
