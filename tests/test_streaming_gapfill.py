"""Streaming gap-fill: emitted rows must equal the batch q135 result
minus each user's final (still-open) hour, including an hour whose
events straddle a micro-batch boundary (exact-sum state carry)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from target_hdfs_spark.streaming.gapfill import stream_hourly_gapfill

SCHEMA = "user_id long, event_id long, ts timestamp, value double"

ROWS_A = [
    # user 1: 10:xx (2 events), silence 11:xx-12:xx, 13:xx opens later
    (1, 1, "2026-08-13T10:05:00", 1.25),
    (1, 2, "2026-08-13T10:40:00", 2.5),
    # user 2: 10:xx open hour; more 10:xx events arrive in batch B
    (2, 3, "2026-08-13T10:10:00", 7.0),
]
ROWS_B = [
    (2, 4, "2026-08-13T10:50:00", 0.5),   # same hour as batch A: carry
    (2, 5, "2026-08-13T11:20:00", 3.0),   # closes user 2's 10:xx
    (1, 6, "2026-08-13T13:15:00", 4.0),   # closes 10:xx, fills 11/12
]


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for u, e, ts, v in rows:
            fh.write(
                json.dumps(
                    {"user_id": u, "event_id": e, "ts": ts, "value": v}
                )
                + "\n"
            )


def _run(spark, src, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_hourly_gapfill(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.user_id, r.hour_start_us, r.n_events, r.value_sum)
        for r in spark.sql(f"select * from {name}").collect()
    }


def _batch_twin(spark, rows):
    """q135's aggregation over the same rows, minus each user's final
    hour (the stream's still-open window)."""
    import datetime as dt

    from target_hdfs_spark.functions.decimals import dec, to_double

    df = spark.createDataFrame(
        [(u, e, dt.datetime.fromisoformat(ts), v) for u, e, ts, v in rows],
        SCHEMA,
    )
    ev = df.select(
        "user_id", "value", F.date_trunc("hour", "ts").alias("hour_start")
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("hour_start").alias("mn"), F.max("hour_start").alias("mx")
    )
    scaffold = bounds.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        ),
    )
    actual = ev.groupBy("user_id", "hour_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        to_double(F.sum(dec("value"))).alias("value_sum"),
    )
    full = scaffold.join(actual, ["user_id", "hour_start"], "left").select(
        "user_id",
        F.unix_micros(F.col("hour_start").cast("timestamp")).alias("hour_start_us"),
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.coalesce(F.col("value_sum"), F.lit(0.0)).alias("value_sum"),
    )
    # drop each user's final (max) hour — still open on the stream side
    mx = full.groupBy("user_id").agg(F.max("hour_start_us").alias("mx_us"))
    closed = full.join(mx, "user_id").filter(
        F.col("hour_start_us") < F.col("mx_us")
    )
    return {
        (r.user_id, r.hour_start_us, r.n_events, r.value_sum)
        for r in closed.collect()
    }


def test_stream_gapfill_matches_batch_closed_hours(spark, tmp_path):
    src = tmp_path / "gsrc"
    _write(src / "a.jsonl", ROWS_A)
    time.sleep(1.1)
    _write(src / "b.jsonl", ROWS_B)
    got = _run(spark, src, "gap_parity")
    expected = _batch_twin(spark, ROWS_A + ROWS_B)
    assert got == expected
    # the boundary-straddling hour (user 2, 10:xx) must carry batch A's
    # events: 2 events summing 7.5 exactly
    straddle = [r for r in got if r[0] == 2 and r[2] == 2]
    assert straddle and straddle[0][3] == 7.5
    # silent hours were zero-filled (user 1: 11:xx and 12:xx)
    zeros = [r for r in got if r[0] == 1 and r[2] == 0]
    assert len(zeros) == 2
