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


# ---------------------------------------------------------------------------
# Temporal interval (attribution-window) join: all touch events within
# a bounded lookback of each conversion — the bounded-range sibling of
# the as-of join above (as-of = latest single row, unbounded; this =
# every row inside [ts - W, ts]).
# ---------------------------------------------------------------------------

_ATTR_WINDOW_MIN = 60  # lookback, minutes


@query(
    "q131_attribution_window_join",
    oracle=f"""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT event_id, user_id, ts, event_type, value
      FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts,
             s.event_id AS touch_id, s.ts AS touch_ts, s.value AS touch_value
      FROM p LEFT JOIN s
        ON s.user_id = p.user_id
       AND s.ts <= p.ts
       AND s.ts > p.ts - INTERVAL {_ATTR_WINDOW_MIN} MINUTE
    )
    SELECT purchase_id, user_id, ts,
           CAST(COUNT(touch_id) AS BIGINT) AS n_touches,
           CAST(CAST(SUM(CAST(touch_value AS DECIMAL(12,4))) AS VARCHAR)
                AS DOUBLE) AS touch_value_sum,
           MAX(touch_id) AS max_touch_id,
           MIN(touch_ts) AS first_touch_ts
    FROM j
    GROUP BY purchase_id, user_id, ts
    """,
    tags=("asof", "range-join", "attribution"),
)
def q131_attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window interval join: for every purchase, aggregate
    ALL non-purchase touch events of the same user inside the
    preceding 60 minutes (inclusive of the purchase instant) — touch
    count, exact-decimal value sum, max touch id, first touch time.
    Purchases with no touches survive with n_touches = 0 (left join).

    Scale: the join key is the EQUI half (user_id) — Spark plans a
    shuffle hash/sort-merge join on user_id with the time-interval
    predicate applied as a residual filter, so the shuffle is
    user-partitioned, never a cross product. A user's events co-locate
    on one reducer (the natural partitioning of attribution at 100 TB);
    per-user interval scans are linear after the within-partition sort.
    The value sum uses the exact-decimal convention
    (functions/decimals.py) so the double result is bit-reproducible
    under any aggregation order.
    """
    from target_hdfs_spark.functions.decimals import dec, to_double

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    s = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("touch_ts"),
        F.col("value").alias("touch_value"),
    )
    j = p.join(
        s,
        (F.col("s_user_id") == F.col("user_id"))
        & (F.col("touch_ts") <= F.col("ts"))
        & (
            F.col("touch_ts")
            > F.col("ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_MIN} MINUTE")
        ),
        "left",
    )
    return j.groupBy("purchase_id", "user_id", "ts").agg(
        F.count("touch_id").alias("n_touches"),
        to_double(F.sum(dec("touch_value"))).alias("touch_value_sum"),
        F.max("touch_id").alias("max_touch_id"),
        F.min("touch_ts").alias("first_touch_ts"),
    )
