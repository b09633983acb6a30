"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a
named (spark, sf_dir) -> DataFrame callable.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL per query (omitted
for the genuinely non-SQL-expressible ones -> rows-only check).

All real logic lives in the target_hdfs_spark package; this module is
pure wiring.

Capability note (table formats): the sink writes parquet natively;
``table_format="delta"|"iceberg"`` is a first-class, tested seam
(``plans/writer.py::require_table_format``) that routes through the
standard ``DataFrameWriter.format(...)`` API and fails fast with a
typed ``TableFormatUnavailableError`` + remediation when the runtime
jars are absent — as they are in this offline container. Parquet-
native equivalents of the table-format semantics ship and are tested:
swap-commit upsert/MERGE (plans/upsert.py), manifest-committed
compaction (plans/compaction.py), schema-drift guard (plans/writer.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from target_hdfs_spark.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    specs = all_queries()
    return specs["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
