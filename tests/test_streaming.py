"""Structured Streaming tests (SURVEY §2B.3): batch-parity of the
foreachBatch ingest (S1), checkpoint restart-resume (S6), windowed
aggregation parity with the batch oracle queries (S2/S3), stateful
dedup (S5), and late-data drop under a watermark (S4)."""

from __future__ import annotations

import json

from target_hdfs_spark.config import TargetConfig
from target_hdfs_spark.streaming.ingest import (
    dedup_within_watermark,
    session_counts_stream,
    stream_jsonl_dir,
    tumbling_counts_stream,
)

SCHEMA = {
    "properties": {
        "id": {"type": "integer"},
        "user": {"type": "string"},
        "at": {"type": "string", "format": "date-time"},
        "v": {"type": "number"},
    }
}


def _write_jsonl(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _rows(n0, n, user="u1", day=13):
    return [
        {"id": i, "user": user, "at": f"2026-08-{day:02d}T10:{i % 60:02d}:00Z", "v": i * 1.5}
        for i in range(n0, n0 + n)
    ]


def test_stream_ingest_batch_parity(spark, tmp_path):
    """S1: the streamed output equals running the batch writer once."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write_jsonl(src / "a.jsonl", _rows(0, 5))
    _write_jsonl(src / "b.jsonl", _rows(5, 5))
    config = TargetConfig(destination_path=str(out), compression="snappy")

    q = stream_jsonl_dir(
        spark, config, "ev", SCHEMA, str(src), str(ckpt), available_now=True
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out / "ev"))
    assert got.count() == 10
    assert {r.id for r in got.collect()} == set(range(10))
    assert dict(got.dtypes)["at"] == "timestamp"


def test_stream_checkpoint_resume_no_duplicates(spark, tmp_path):
    """S6: restart with the same checkpoint skips already-committed
    files; new files are picked up exactly once."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write_jsonl(src / "a.jsonl", _rows(0, 4))
    config = TargetConfig(destination_path=str(out), compression="snappy")

    q = stream_jsonl_dir(spark, config, "ev", SCHEMA, str(src), str(ckpt))
    q.awaitTermination(120)
    assert spark.read.parquet(str(out / "ev")).count() == 4

    _write_jsonl(src / "b.jsonl", _rows(4, 3))
    q2 = stream_jsonl_dir(spark, config, "ev", SCHEMA, str(src), str(ckpt))
    q2.awaitTermination(120)
    got = spark.read.parquet(str(out / "ev"))
    assert got.count() == 7  # 4 + 3, no replay of a.jsonl
    assert {r.id for r in got.collect()} == set(range(7))


def _streamed_rows(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    """S2: streamed windowed counts == the same aggregation in batch
    (the oracle strategy for streaming ops)."""
    src = tmp_path / "src"
    rows = _rows(0, 30)
    _write_jsonl(src / "a.jsonl", rows)
    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark

    schema = jsonschema_to_spark(SCHEMA)
    stream = spark.readStream.schema(schema).json(str(src))
    got = _streamed_rows(
        spark, tumbling_counts_stream(stream, "at", "10 minutes"), "tumbling_t"
    )

    batch = spark.read.schema(schema).json(str(src))
    import pyspark.sql.functions as F

    want = (
        batch.groupBy(F.window("at", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_window_stream(spark, tmp_path):
    """S3: streamed session windows produce gap-merged sessions."""
    src = tmp_path / "src"
    rows = [
        {"id": 1, "user": "u1", "at": "2026-08-13T10:00:00Z", "v": 1.0},
        {"id": 2, "user": "u1", "at": "2026-08-13T10:03:00Z", "v": 1.0},
        # > 5 min gap -> new session
        {"id": 3, "user": "u1", "at": "2026-08-13T10:20:00Z", "v": 1.0},
        {"id": 4, "user": "u2", "at": "2026-08-13T10:00:00Z", "v": 1.0},
    ]
    _write_jsonl(src / "a.jsonl", rows)
    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark

    schema = jsonschema_to_spark(SCHEMA)
    stream = spark.readStream.schema(schema).json(str(src))
    got = _streamed_rows(
        spark, session_counts_stream(stream, "at", "user", "5 minutes"), "session_t"
    )
    per_user = sorted((r.user, r.n_events) for r in got)
    assert per_user == [("u1", 1), ("u1", 2), ("u2", 1)]


def test_stateful_dedup_within_watermark(spark, tmp_path):
    """S5: replayed records (same key, same/near timestamps) collapse."""
    src = tmp_path / "src"
    rows = _rows(0, 5) + _rows(0, 5)  # exact replay, same file
    _write_jsonl(src / "a.jsonl", rows)
    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark

    schema = jsonschema_to_spark(SCHEMA)
    stream = spark.readStream.schema(schema).json(str(src))
    deduped = dedup_within_watermark(stream, ["id"], "at", "30 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT id FROM dedup_t").collect()
    assert sorted(r.id for r in got) == list(range(5))


def test_late_data_dropped_after_window_eviction(spark, tmp_path):
    """S4: Spark's actual watermark guarantee (verified empirically on
    4.1.2): a window in append mode is emitted exactly once — when the
    end-of-batch watermark passes its end and its state is evicted —
    and rows arriving after that eviction are dropped, never
    resurrecting or double-emitting the window. (Rows merely below the
    operative watermark but whose window state still exists ARE
    aggregated — watermark drops are best-effort until eviction.)

    Four micro-batches in mtime order: 12:00 opens window A; 13:00 and
    13:30 advance the watermark so A is emitted and evicted; then a
    too-late 12:00:30 row must vanish.
    """
    import time

    src = tmp_path / "src"
    files = [
        ("f1.jsonl", [{"id": 1, "user": "u", "at": "2026-08-13T12:00:00Z", "v": 1.0}]),
        ("f2.jsonl", [{"id": 2, "user": "u", "at": "2026-08-13T13:00:00Z", "v": 1.0}]),
        ("f3.jsonl", [{"id": 3, "user": "u", "at": "2026-08-13T13:30:00Z", "v": 1.0}]),
        ("f4.jsonl", [
            {"id": 4, "user": "u", "at": "2026-08-13T12:00:30Z", "v": 1.0},  # too late
            {"id": 5, "user": "u", "at": "2026-08-13T14:00:00Z", "v": 1.0},
        ]),
    ]
    for name, rows in files:
        _write_jsonl(src / name, rows)
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark

    schema = jsonschema_to_spark(SCHEMA)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    windowed = tumbling_counts_stream(stream, "at", "10 minutes", delay="1 minute")
    q = (
        windowed.writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.window_start.isoformat(), r.n_events) for r in spark.sql("SELECT * FROM late_t").collect()}
    # window A emitted exactly once with only the on-time row
    assert ("2026-08-13T12:00:00", 1) in got
    assert not any(n != 1 for w, n in got if w == "2026-08-13T12:00:00")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Double-watermarked stream-stream join produces exactly the rows
    the equivalent batch interval join produces."""
    from target_hdfs_spark.streaming.ingest import stream_stream_attribution_join
    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark
    import pyspark.sql.functions as F

    psrc, vsrc = tmp_path / "p", tmp_path / "v"
    purchases = [
        {"id": 1, "user": "u1", "at": "2026-08-13T10:00:00Z", "v": 1.0},
        {"id": 2, "user": "u1", "at": "2026-08-13T11:00:00Z", "v": 1.0},
        {"id": 3, "user": "u2", "at": "2026-08-13T10:10:00Z", "v": 1.0},
    ]
    views = [
        {"id": 10, "user": "u1", "at": "2026-08-13T09:45:00Z", "v": 0.0},  # -> p1
        {"id": 11, "user": "u1", "at": "2026-08-13T09:20:00Z", "v": 0.0},  # too old
        {"id": 12, "user": "u1", "at": "2026-08-13T10:50:00Z", "v": 0.0},  # -> p2
        {"id": 13, "user": "u2", "at": "2026-08-13T10:05:00Z", "v": 0.0},  # -> p3
        {"id": 14, "user": "u3", "at": "2026-08-13T10:00:00Z", "v": 0.0},  # no purchase
    ]
    _write_jsonl(psrc / "a.jsonl", purchases)
    _write_jsonl(vsrc / "a.jsonl", views)

    schema = jsonschema_to_spark(SCHEMA)

    def prep(df):
        return df.select(
            F.col("user").alias("user_id"),
            F.col("id").alias("event_id"),
            F.col("at").alias("ts"),
            "v",
        )

    pstream = prep(spark.readStream.schema(schema).json(str(psrc)))
    vstream = prep(spark.readStream.schema(schema).json(str(vsrc)))
    joined = stream_stream_attribution_join(pstream, vstream, "30 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM ssjoin_t").collect()
    )
    assert got == [(1, 10), (2, 12), (3, 13)]


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: matched purchases pair up;
    unmatched purchases emit null-padded once the watermark passes
    (a trailing fresh event advances the watermark far enough)."""
    import time
    from target_hdfs_spark.streaming.ingest import stream_stream_attribution_join_outer
    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark
    import pyspark.sql.functions as F

    psrc, vsrc = tmp_path / "p", tmp_path / "v"
    _write_jsonl(psrc / "a.jsonl", [
        {"id": 1, "user": "u1", "at": "2026-08-13T10:00:00Z", "v": 1.0},  # matched
        {"id": 2, "user": "u2", "at": "2026-08-13T10:00:00Z", "v": 1.0},  # no view
    ])
    time.sleep(1.1)
    # late fresh purchase pushes the watermark hours past the others
    _write_jsonl(psrc / "b.jsonl", [
        {"id": 9, "user": "u9", "at": "2026-08-13T15:00:00Z", "v": 1.0},
    ])
    _write_jsonl(vsrc / "a.jsonl", [
        {"id": 10, "user": "u1", "at": "2026-08-13T09:50:00Z", "v": 0.0},
        {"id": 19, "user": "u9", "at": "2026-08-13T15:30:00Z", "v": 0.0},  # keeps v side fresh
    ])

    schema = jsonschema_to_spark(SCHEMA)

    def prep(df):
        return df.select(
            F.col("user").alias("user_id"),
            F.col("id").alias("event_id"),
            F.col("at").alias("ts"),
            "v",
        )

    pstream = prep(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(psrc))
    )
    vstream = prep(spark.readStream.schema(schema).json(str(vsrc)))
    joined = stream_stream_attribution_join_outer(pstream, vstream, "30 minutes",
                                                  delay="1 minute")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssouter_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.purchase_id, r.view_id) for r in spark.sql("SELECT * FROM ssouter_t").collect()}
    assert (1, 10) in got            # matched pair
    assert (2, None) in got          # unmatched emitted null-padded


def test_state_metrics_surface_watermark_eviction(spark, tmp_path):
    """State-store metrics (S6 surface): a watermarked stateful agg
    reports its state operator with row counts; the stateless ingest
    query reports none."""
    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark
    from target_hdfs_spark.streaming.ingest import progress_summary, state_metrics

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write_jsonl(src / "a.jsonl", _rows(0, 30))
    schema = jsonschema_to_spark(SCHEMA)
    stream = spark.readStream.schema(schema).json(str(src))
    windowed = tumbling_counts_stream(stream, "at", "10 minutes")
    q = (
        windowed.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    mets = state_metrics(q)
    assert len(mets) == 1
    m = mets[0]
    assert m["rows_total"] is not None and m["rows_total"] >= 0
    assert m["memory_used_bytes"] is None or m["memory_used_bytes"] >= 0

    summary = progress_summary(q)
    assert summary["n_state_operators"] == 1
    assert summary["batch_id"] is not None

    # stateless ingest query: no state operators
    config = TargetConfig(destination_path=str(tmp_path / "out2"), compression="snappy")
    q2 = stream_jsonl_dir(
        spark, config, "ev", SCHEMA, str(src), str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert state_metrics(q2) == []
    s2 = progress_summary(q2)
    assert s2 == {} or s2["n_state_operators"] == 0


def test_session_straddles_microbatch_boundary_with_late_gap_event(
    spark, tmp_path
):
    """S3 adversarial case (round-4 verdict ask #6): two events land in
    micro-batch 1 more than a gap apart (two separate open sessions);
    a LATE event arrives in micro-batch 2 with a timestamp INSIDE the
    gap between them, within the watermark delay. Spark 4.1.2 must
    merge all three into ONE session — pinning that session-window
    state merges across micro-batch boundaries rather than finalizing
    eagerly — and the merged result must equal the batch q33-style
    aggregation over the full corpus."""
    import time

    import pyspark.sql.functions as F

    src = tmp_path / "src"
    f1 = [
        {"id": 1, "user": "u1", "at": "2026-08-13T10:00:00Z", "v": 1.0},
        # 8 min > the 5-min gap: a SEPARATE session as of batch 1
        {"id": 2, "user": "u1", "at": "2026-08-13T10:08:00Z", "v": 1.0},
        {"id": 3, "user": "u2", "at": "2026-08-13T10:00:00Z", "v": 1.0},
    ]
    # batch 2: late event inside the (10:00, 10:08) gap — 4 min from
    # BOTH neighbors, so it bridges the two batch-1 sessions
    f2 = [{"id": 4, "user": "u1", "at": "2026-08-13T10:04:00Z", "v": 1.0}]
    _write_jsonl(src / "a.jsonl", f1)
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    _write_jsonl(src / "b.jsonl", f2)

    from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark

    schema = jsonschema_to_spark(SCHEMA)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        session_counts_stream(stream, "at", "user", "5 minutes")
        .writeStream.format("memory")
        .queryName("session_straddle_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM session_straddle_t").collect())
    )

    batch = spark.read.schema(schema).json(str(src))
    want = sorted(
        map(
            tuple,
            batch.groupBy(F.session_window("at", "5 minutes"), "user")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
            )
            .collect(),
        )
    )
    assert got == want
    # u1: the late gap event fused the straddling sessions into ONE
    u1 = [t for t in got if t[0] == "u1"]
    assert len(u1) == 1 and u1[0][3] == 3
