"""Parquet table readers for the benchmark/test star schema.

A plain ``spark.read.parquet`` is deliberately all there is: Catalyst
gets filter pushdown, column pruning and partition pruning for free
from the declarative scan — no custom reader machinery needed. At
100 TB the same call reads a hive-partitioned directory tree; nothing
here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``.

    events.ts is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read nanos as raw int64
    (legacy conf) and floor-divide to microseconds — exactly the
    truncation DuckDB applies when it reads the same file, so oracle
    comparisons stay bit-identical.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # only nanos-encoded files surface ts as a long; an events
        # table rewritten with proper timestamps passes through
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
