"""As-of (point-in-time) join — E8 in SURVEY.md §2B.

Spark has no native ASOF JOIN. The engine implements it as the
union-and-fill construction:

1. tag right rows 1 and left rows 0, union them on the shared key/time
   columns;
2. sort within each key by (time, tag, unique id) — so at equal
   timestamps the left row sorts *before* right rows, giving strict
   "right.ts < left.ts" semantics;
3. ``last(right_value, ignorenulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT ROW carries the most recent right-side values
   forward;
4. keep only left rows.

Scale: one shuffle on the key column (the same shuffle a sort-merge
join would need), one in-partition sort, no row explosion — unlike a
range join + row_number which can go quadratic per key. This is the
standard large-scale point-in-time-correctness pattern for feature
stores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_values: dict[str, str],
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Strict as-of join: for each left row, attach ``right_values``
    (mapping right column -> output alias) from the right row with the
    greatest ``ts`` strictly less than the left row's ``ts`` and the
    same ``by`` key. Ties among right rows resolve to the greatest
    ``right_id`` (total ordering -> deterministic).
    """
    lhs = left.select(
        F.col(by).alias("_by"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(left_id).alias("_id"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"_rv_{alias}")
          for src, alias in right_values.items()],
    )
    rhs = right.select(
        F.col(by).alias("_by"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.col(right_id).alias("_id"),
        F.lit(None).cast(lhs.schema["_left"].dataType).alias("_left"),
        *[F.col(src).alias(f"_rv_{alias}") for src, alias in right_values.items()],
    )
    w = (
        Window.partitionBy("_by")
        .orderBy("_ts", "_tag", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lhs.unionByName(rhs).select(
        "_tag",
        "_left",
        *[
            F.last(f"_rv_{alias}", ignorenulls=True).over(w).alias(alias)
            for alias in right_values.values()
        ],
    )
    out_cols: list[Column] = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(alias) for alias in right_values.values()]
    return filled.filter(F.col("_tag") == 0).select(*out_cols)


@query(
    "q30_asof_join_last_view",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, 0 AS tag, event_id,
             event_id AS p_event_id, value AS purchase_value,
             CAST(NULL AS BIGINT) AS _v_id, CAST(NULL AS DOUBLE) AS _v_val
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS tag, event_id,
             NULL, NULL, event_id, value
      FROM events WHERE event_type = 'view'
    )
    SELECT p_event_id AS event_id, user_id, ts, purchase_value,
           last_view_id, last_view_value
    FROM (
      SELECT *,
        last_value(_v_id IGNORE NULLS) OVER w AS last_view_id,
        last_value(_v_val IGNORE NULLS) OVER w AS last_view_value
      FROM tagged
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, tag, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )
    )
    WHERE tag = 0
    """,
    tags=("asof", "window"),
)
def q30_asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent strictly-earlier view
    event of the same user (classic attribution / point-in-time join).
    The oracle runs the identical union-and-fill algorithm in SQL, so
    the match verifies the construction itself."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        views,
        by="user_id",
        ts="ts",
        right_values={"event_id": "last_view_id", "value": "last_view_value"},
        left_id="event_id",
        right_id="event_id",
    )


@query(
    "q107_pit_feature_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, 0 AS tag, event_id,
             event_id AS p_event_id, value AS purchase_value,
             CAST(NULL AS DOUBLE) AS _v_val, CAST(NULL AS DOUBLE) AS _c_val
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 1 AS tag, event_id,
             NULL, NULL, value, NULL
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, 1 AS tag, event_id,
             NULL, NULL, NULL, value
      FROM events WHERE event_type = 'click'
    )
    SELECT p_event_id AS event_id, user_id, ts, purchase_value,
           last_view_value, last_click_value
    FROM (
      SELECT *,
        last_value(_v_val IGNORE NULLS) OVER w AS last_view_value,
        last_value(_c_val IGNORE NULLS) OVER w AS last_click_value
      FROM tagged
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, tag, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )
    )
    WHERE tag = 0
    """,
    tags=("asof", "window", "feature-store"),
)
def q107_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time multi-feature join (the feature-store pattern):
    for every purchase event, attach the most recent strictly-earlier
    view value AND click value of the same user — two independent
    feature streams, no leakage from the future.

    Built as two chained as-of joins; because the feature streams are
    independent, this equals one tagged union with two carried-forward
    columns, which is what the oracle runs. Both as-of passes shuffle
    on the same user_id key, so the second reuses the first's
    partitioning (Exchange reuse; at 1000 executors this is one
    shuffle of each feature table, never a range-join explosion)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    with_view = asof_join(
        purchases,
        views,
        by="user_id",
        ts="ts",
        right_values={"value": "last_view_value"},
        left_id="event_id",
        right_id="event_id",
    )
    return asof_join(
        with_view,
        clicks,
        by="user_id",
        ts="ts",
        right_values={"value": "last_click_value"},
        left_id="event_id",
        right_id="event_id",
    )
