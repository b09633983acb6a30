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


# ---------------------------------------------------------------------------
# Bloom-join: semi-join reduction via a broadcastable bit filter
# ---------------------------------------------------------------------------


def _bloom_oracle() -> str:
    from target_hdfs_spark.functions.bloom import BLOOM_BUILD_SQL, positions_sql

    key_pos = positions_sql("key")
    positions_union = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM keyset" for p in key_pos
    )
    build = BLOOM_BUILD_SQL.format(positions_union=positions_union)
    li_pos = positions_sql("l_partkey")
    li_pos_list = ", ".join(li_pos)
    # The probe is keyed on DISTINCT l_partkey (bloom membership is a
    # function of the key alone), then joined back to the fact rows —
    # the synthetic lineitem has no unique row key, so a per-row
    # grouping would silently merge rows.
    return f"""
    WITH keyset AS (
      SELECT DISTINCT p_partkey AS key FROM part WHERE p_size >= 48
    ),
    bloom AS ({build}),
    pkpos AS (
      SELECT l_partkey, unnest([{li_pos_list}]) AS pos
      FROM (SELECT DISTINCT l_partkey FROM lineitem)
    ),
    pass AS (
      SELECT l_partkey
      FROM pkpos
      JOIN bloom b
        ON b.word_idx = pos // 32
       AND (b.word & (CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))) <> 0
      GROUP BY l_partkey
      HAVING COUNT(*) = 4
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN k.key IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact
    FROM lineitem l
    JOIN pass p ON l.l_partkey = p.l_partkey
    LEFT JOIN keyset k ON l.l_partkey = k.key
    GROUP BY l.l_returnflag
    """


@query(
    "q109_bloom_join_reduction",
    oracle=_bloom_oracle(),
    tags=("scale-pattern", "bloom", "join"),
)
def q109_bloom_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-join semi-join reduction, end to end: build a 2048-bit
    deterministic Bloom filter over a filtered part-key set, prefilter
    lineitem map-side against the broadcast filter, then exact-verify
    the survivors. Output per returnflag: candidate count (bloom pass)
    vs exact count — the gap IS the measured false-positive volume, so
    the filter's correctness (zero false negatives) and its selectivity
    are both oracle-checked.

    Scale shape: the filter table is <= 64 rows whatever the key-set
    size; the probe is 4 broadcast equi-joins + bit tests fused into
    the scan stage. Only bloom survivors reach the exact join — at
    100 TB this is the pattern for joining a fact table against a
    subquery-derived key set the optimizer can't see through."""
    from target_hdfs_spark.functions.bloom import bloom_build, bloom_probe

    part = load_table(spark, sf_dir, "part")
    keyset = (
        part.where(F.col("p_size") >= 48)
        .select(F.col("p_partkey").alias("key"))
        .distinct()
    )
    bloom = bloom_build(keyset, "key")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"
    )
    candidates = bloom_probe(li, "l_partkey", bloom)
    verified = candidates.join(
        F.broadcast(keyset), candidates.l_partkey == F.col("key"), "left"
    )
    return verified.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(
            F.when(F.col("key").isNotNull(), 1).otherwise(0)
        ).alias("n_exact"),
    )
