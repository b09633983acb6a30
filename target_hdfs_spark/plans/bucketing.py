"""Bucketed tables: pre-shuffled storage for co-located joins
(SURVEY §2B scale mandate: "Co-locate joins via bucketing or
pre-partitioning").

A table bucketed by its join key is hash-partitioned *on disk*; a
join between two tables bucketed the same way needs no Exchange at
all — at 100 TB that removes the single largest cost of fact-fact
joins that repeat across a workload (e.g. lineitem |><| orders on
orderkey, every day). The write pays the shuffle once; every
downstream join reads it back for free.

Verified by tests/test_bucketing.py: the bucketed join plan contains
zero Exchange operators, the plain-parquet control plan contains two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (optionally sorted) parquet table in
    the session catalog. Sorting within buckets additionally removes
    the join's sort step (sort-merge join reads presorted runs)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (0 for a fully
    co-located join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket counts Spark plans a shuffle-free sort-merge
    join; callers can assert via n_exchanges()."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
