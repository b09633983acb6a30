"""SparkSession factory with scale-oriented defaults.

Designed for a real multi-executor cluster; tested on local[N]. The
defaults below are the ones that matter at 100 TB:

- AQE on (runtime re-plan: coalesce shuffle partitions, skew-join
  splitting, dynamic broadcast selection).
- Arrow enabled for the few Pandas-UDF paths (vectorized transfer).
- shuffle partitions sized for the test harness; on a real cluster this
  is overridden (or left to AQE's coalescing with a high initial count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "target_hdfs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory partition size when coalescing instead
        # of refusing to go below default parallelism (the Spark-docs
        # recommended production setting): a reduce stage whose data
        # fits one advisory-sized partition runs 1 task, not 32 — at
        # sf0.1 this removes ~30 no-op tasks per shuffle, and on a
        # real cluster it keeps reducers advisory-sized as data grows.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
