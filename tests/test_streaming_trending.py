"""Streaming trending terms: the windowed-count + foreachBatch-rank
composition must equal the batch per-window top-k over the same
finalized windows."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from target_hdfs_spark.functions.textfuncs import tokens
from target_hdfs_spark.streaming.trending import (
    rank_topk,
    read_trending,
    windowed_token_counts_stream,
    write_trending_topk,
)


def _doc(ts: str, text: str) -> dict:
    return {"ts": ts, "text": text}


ROWS = [
    # window 10:00-10:10 — "alpha" dominates, then beta, gamma
    _doc("2026-08-13T10:01:00Z", "alpha alpha alpha beta beta gamma"),
    _doc("2026-08-13T10:05:00Z", "alpha beta delta"),
    # window 10:10-10:20 — "delta" dominates
    _doc("2026-08-13T10:11:00Z", "delta delta delta gamma"),
    _doc("2026-08-13T10:15:00Z", "delta epsilon epsilon"),
    # window 10:20-10:30 — tie between zeta and eta (token tie-break)
    _doc("2026-08-13T10:21:00Z", "zeta eta zeta eta theta"),
    # flush row: advances the watermark far past the windows above
    _doc("2026-08-13T14:00:00Z", "flush"),
]


def test_trending_topk_stream_matches_batch(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    with open(src / "docs.jsonl", "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema("ts timestamp, text string").json(str(src))
    counts = windowed_token_counts_stream(stream, "ts", "10 minutes", "10 minutes")
    q = write_trending_topk(counts, str(sink), str(ckpt), k=2)
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.token, r.n, r.rnk)
        for r in read_trending(spark, str(sink)).collect()
    }

    batch = spark.read.schema("ts timestamp, text string").json(str(src))
    batch_counts = (
        batch.select("ts", F.explode(tokens("text")).alias("token"))
        .groupBy(F.window("ts", "10 minutes"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "token",
            "n",
        )
    )
    # the stream only emits windows FINALIZED by the watermark
    # (end <= max_ts - delay); restrict the batch twin the same way
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    finalized = batch_counts.filter(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    )
    want = {
        (str(r.window_start), r.token, r.n, r.rnk)
        for r in rank_topk(finalized, 2).collect()
    }
    assert got == want
    # shape sanity: 3 finalized windows x top-2
    assert len(got) == 6
    # the tie window ranks deterministically by token (eta before zeta)
    tie = sorted(t for t in got if t[0].startswith("2026-08-13 10:2"))
    assert [t[1] for t in tie] == ["eta", "zeta"]


def test_trending_sink_idempotent_under_batch_replay(spark, tmp_path):
    """A replayed foreachBatch (crash between sink write and checkpoint
    commit) must not duplicate rows: batch-id-keyed overwrite writes."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()
    with open(src / "docs.jsonl", "w") as fh:
        for r in ROWS:
            fh.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema("ts timestamp, text string").json(str(src))
    counts = windowed_token_counts_stream(stream, "ts", "10 minutes", "10 minutes")
    q = write_trending_topk(counts, str(sink), str(ckpt), k=2)
    q.awaitTermination(120)
    first = sorted(map(tuple, read_trending(spark, str(sink)).collect()))

    # simulate the replay: re-run the emitted batch's write with the
    # same batch_id — the sink must be unchanged, not doubled
    finalized = spark.read.option("basePath", str(sink)).parquet(str(sink))
    batch_ids = [r.batch_id for r in finalized.select("batch_id").distinct().collect()]
    assert batch_ids, "stream produced no batches"
    replay_id = batch_ids[0]
    replay_rows = (
        finalized.filter(F.col("batch_id") == replay_id)
        .drop("batch_id", "rnk")
        .select("window_start", "window_end", "token", "n")
    )
    rank_topk(replay_rows, 2).write.mode("overwrite").parquet(
        f"{sink}/batch_id={replay_id}"
    )
    again = sorted(map(tuple, read_trending(spark, str(sink)).collect()))
    assert again == first
