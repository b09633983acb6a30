"""Skew-handling aggregation patterns (SURVEY §2B scale mandate:
"skewed keys hurt ... salting for skew").

AQE's skew-join splitting handles join-side skew automatically; what
it cannot fix is a low-cardinality groupBy where a handful of hot
keys serialize onto single reducers. The two-stage *salted*
aggregation below is the standard fix: partial-aggregate on
(key, salt) — fanning each hot key across N reducers — then
re-aggregate on the key alone. Exact because the engine's decimal
convention makes partial sums order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from target_hdfs_spark.functions.decimals import dec, to_double
from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table


def salted_sum_count(
    df: DataFrame,
    key: str,
    value_col: Column,
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant sum/count: groupBy(key, salt) partials,
    then groupBy(key) finals. `salt_col` must be deterministic for
    reproducibility (a uniform id column beats rand() and keeps the
    result oracle-checkable)."""
    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value_col).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("_sum"),
        F.sum("_pcnt").alias("n_rows"),
    )


@query(
    "q34_salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
             AS total_value,
           COUNT(*) AS n_rows,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew", "salting"),
)
def q34_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a 5-value key (events.event_type — maximal skew:
    the whole table lands on 5 reducers in the naive plan) using the
    salted two-stage pattern. The oracle is the plain GROUP BY: the
    salting is a physical rewrite with identical semantics, which the
    value-hash check proves.

    Scale: stage 1 spreads each hot key over 16 reducers; stage 2
    aggregates 5*16 partial rows — the hot-key serialization is gone
    and both shuffles are map-side combined.
    """
    ev = load_table(spark, sf_dir, "events")
    sums = salted_sum_count(
        ev, "event_type", dec("value"), F.col("event_id"), n_salts=16
    ).select("event_type", to_double(F.col("_sum")).alias("total_value"), "n_rows")
    minmax = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "_salt")
        .agg(F.min("value").alias("_pmin"), F.max("value").alias("_pmax"))
        .groupBy("event_type")
        .agg(F.min("_pmin").alias("min_value"), F.max("_pmax").alias("max_value"))
    )
    return sums.join(minmax, "event_type").select(
        "event_type", "total_value", "n_rows", "min_value", "max_value"
    )
