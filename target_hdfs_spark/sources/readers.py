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
        # Deliberately SESSION-WIDE (set once, never restored): the
        # conf must hold when the lazy scan EXECUTES, not just when the
        # frame is built, so a scoped set/restore would break any
        # events-derived plan collected later. Side effect is benign
        # for this engine's datasets: only TIMESTAMP(NANOS) columns are
        # affected, and events is the sole nanos-encoded table.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # only nanos-encoded files surface ts as a long; an events
        # table rewritten with proper timestamps passes through
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, key: str, partitions: int | None = None) -> DataFrame:
    """Hash-repartition a compact input on `key` before a
    compute-amplifying chain (minhash shingle explosion, per-vector
    distance math, codec decode).

    Why this is the right call at BOTH ends of the scale: the shuffle
    moves the pre-explosion form (a few bytes per row), which is the
    cheapest point in the pipeline to rebalance; the expensive work
    after it then uses every core. Small SF exposes the need acutely —
    the test tables are single-row-group parquet files, and one row
    group = one scan task, so without this the md5/fold-heavy stages
    run on 1 of 32 cores. At 100 TB inputs arrive as thousands of
    splits, but skewed or few-splits inputs (one giant gzip JSONL, a
    coalesced upstream write) hit the identical failure mode.

    Hash partitioning is deterministic and every downstream operator
    in this engine is partitioning-invariant (the seeded-sample query
    q21 is the one partitioning-sensitive op; it does not use this).
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key)
