"""Time-window operators over the events stream table — batch analogs
of the streaming surface (SURVEY.md §2B.3 S2/S3). The same
``window()`` / ``session_window()`` expressions run unchanged under
Structured Streaming (streaming/ingest.py); verifying them in batch
mode against the SQL oracle verifies the streaming semantics too,
minus watermarking (covered by tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table


@query(
    "q31_tumbling_window",
    oracle="""
    SELECT
      time_bucket(INTERVAL '1 day', ts) AS window_start,
      time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
      event_type,
      COUNT(*) AS n_events,
      MIN(value) AS min_value,
      MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("window", "time", "streaming-analog"),
)
def q31_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event type (S2 batch analog).

    Scale: a tumbling window is just a computed grouping key — one
    shuffle, map-side combined. Identical code runs under
    readStream + withWatermark.
    """
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 day")
    return (
        ev.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
        )
    )


@query(
    "q32_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_id
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_id
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events
    FROM assigned
    GROUP BY 1, 2
    """,
    tags=("window", "time", "streaming-analog"),
)
def q32_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): every event lands in
    size/slide = 2 windows. The oracle materializes the same two
    bucket assignments explicitly.

    Scale: Spark expands each row into size/slide window copies before
    the shuffle — cost is linear in that factor; keep slide a sane
    fraction of size at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


@query(
    "q33_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '10 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "session", "streaming-analog"),
)
def q33_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap (S3).
    Spark's session_window merges events <= gap apart (an event landing
    EXACTLY at last+gap still merges — boundary semantics pinned by
    tests/test_session_property.py); session end is last event + gap.
    The oracle reproduces exactly that with the lag + cumulative-sum
    sessionization (new session strictly beyond the gap).

    Scale: session_window shuffles once on user_id then merges
    in-partition — same cost shape as the window-function fallback,
    but it also runs unchanged under Structured Streaming with state
    cleanup by watermark.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# S2 x L4: trending terms — batch twin of streaming/trending.py
# ---------------------------------------------------------------------------


@query(
    "q123_trending_topk",
    oracle="""
    WITH docs_ts AS (
      SELECT doc_id, text,
             TIMESTAMP '2026-01-05' + (doc_id % 7) * INTERVAL 1 DAY AS ts
      FROM documents
    ),
    tok AS (
      SELECT ts,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS token
      FROM docs_ts
    ),
    counts AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
             time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY AS window_end,
             token, COUNT(*) AS n
      FROM tok GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY window_start ORDER BY n DESC, token
             ) AS rnk
      FROM counts
    )
    SELECT window_start, window_end, token, n, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("window", "text", "topk", "streaming-analog"),
)
def q123_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window trending terms: tumbling 1-day windows over a
    deterministic document event-time (doc_id % 7 spreads the corpus
    over a week), token counts per window, top-5 per window. The
    ranking stage is LITERALLY the streaming operator's
    (streaming/trending.py::rank_topk — the exact function foreachBatch
    applies to each finalized window), so a driver-green row here
    oracle-checks the streaming pipeline's ranking semantics, which the
    harness cannot drive directly (round-4 verdict ask #5).

    Scale: explode is pipelined; the count combines map-side; ranking
    shuffles once on window_start and applies rank<=k stream-side
    (WindowGroupLimit). Same cost shape at any corpus size — windows
    are bounded by the calendar, tokens by vocabulary.
    """
    from target_hdfs_spark.functions.textfuncs import tokens
    from target_hdfs_spark.streaming.trending import rank_topk

    docs = load_table(spark, sf_dir, "documents")
    with_ts = docs.select(
        F.explode(tokens("text")).alias("token"),
        (
            F.lit("2026-01-05").cast("timestamp")
            + F.make_interval(days=(F.col("doc_id") % 7).cast("int"))
        ).alias("ts"),
    )
    counts = (
        with_ts.groupBy(F.window("ts", "1 day"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "token",
            "n",
        )
    )
    return rank_topk(counts, 5)


# ---------------------------------------------------------------------------
# Time-series gap filling: per-user hourly scaffold with zero-filled
# activity — the densification step every downstream time-series model
# (forecasting, anomaly scoring) needs, and the operator naive GROUP BY
# cannot produce (missing hours simply don't exist as groups).
# ---------------------------------------------------------------------------


@query(
    "q135_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS mn,
             date_trunc('hour', MAX(ts)) AS mx
      FROM events GROUP BY user_id
    ),
    scaffold AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR))
               AS hour_start
      FROM bounds
    ),
    actual AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_start,
             COUNT(*) AS n_events,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               AS value_sum
      FROM events GROUP BY 1, 2
    )
    SELECT s.user_id, s.hour_start,
           COALESCE(a.n_events, CAST(0 AS BIGINT)) AS n_events,
           COALESCE(a.value_sum, CAST(0.0 AS DOUBLE)) AS value_sum
    FROM scaffold s LEFT JOIN actual a
      ON a.user_id = s.user_id AND a.hour_start = s.hour_start
    """,
    tags=("timeseries", "gapfill", "window"),
)
def q135_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly gap filling: generate every hour bucket between
    a user's first and last event (inclusive, hour-truncated) and
    left-join the actual per-hour activity, zero-filling silent hours.
    Counts are exact integers; the value sum uses the exact-decimal
    convention.

    Scale: the silent hours are generated from the GAPS between
    consecutive active hours (``lead`` over the per-user hourly
    rollup + ``sequence``/``explode``), unioned with the rollup —
    identical rows to the scaffold-left-join formulation (a user's
    first/last hours are active, so actual hours + in-gap zeros cover
    exactly [min, max]) but the corpus is scanned once and the
    scaffold is never shuffled: one rollup exchange, one |active
    hours| window exchange, zeros emitted map-side. Span skew is the
    watch item: one user silent for years yields a long gap array —
    at 100 TB, cap spans or shard long gaps first; row volume here is
    bounded by total hours per user, the same cardinality the
    downstream model consumes anyway.
    """
    from target_hdfs_spark.functions.decimals import dec, to_double

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.date_trunc("hour", "ts").alias("hour_start")
    )
    actual = (
        ev.groupBy("user_id", "hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            to_double(F.sum(dec("value"))).alias("value_sum"),
        )
        # two consumers (union branch + gap window) — materialize the
        # rollup once so the corpus is scanned/aggregated once
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("user_id").orderBy("hour_start")
    hour = F.expr("INTERVAL 1 HOUR")
    gaps = (
        actual.withColumn("nxt", F.lead("hour_start").over(w))
        .filter(F.col("nxt") > F.col("hour_start") + hour)
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("hour_start") + hour, F.col("nxt") - hour, hour
                )
            ).alias("hour_start"),
            F.lit(0).cast("long").alias("n_events"),
            F.lit(0.0).alias("value_sum"),
        )
    )
    return actual.select(
        "user_id",
        "hour_start",
        F.col("n_events").cast("long").alias("n_events"),
        "value_sum",
    ).unionByName(gaps)
