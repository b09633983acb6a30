"""Streaming drift monitor: the per-batch chi-square must be ~0 for
batches drawn from the baseline mix, large for a shifted mix, equal
to the batch-twin arithmetic, and replay-idempotent."""

from __future__ import annotations

import json
import time

from target_hdfs_spark.streaming.drift import (
    CLASSES,
    chi2_against,
    class_counts,
    latest_readings,
    stream_drift_monitor,
)

SCHEMA = "event_id long, event_type string"


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for eid, et in rows:
            fh.write(json.dumps({"event_id": eid, "event_type": et}) + "\n")


def _run(spark, src, sink, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_drift_monitor(spark, stream, str(sink), str(ckpt))
    q.awaitTermination(120)


BASELINE_MIX = [(i, CLASSES[i % len(CLASSES)]) for i in range(100)]   # uniform
SAME_MIX = [(200 + i, CLASSES[i % len(CLASSES)]) for i in range(50)]  # uniform
SHIFTED_MIX = [(400 + i, "error") for i in range(50)]                 # all one class


def test_drift_monitor_flags_shift_not_stability(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write(src / "a.jsonl", BASELINE_MIX)
    time.sleep(1.1)
    _write(src / "b.jsonl", SAME_MIX)
    time.sleep(1.1)
    _write(src / "c.jsonl", SHIFTED_MIX)
    _run(spark, src, sink, ckpt)
    readings = {
        r.batch_id: r.chi2 for r in latest_readings(spark, str(sink)).collect()
    }
    assert len(readings) == 3
    assert readings[0] == 0.0         # baseline scored against itself
    assert readings[1] == 0.0         # identical mix
    assert readings[2] > 50.0         # all-error batch: massive drift

    # the shifted reading equals the batch-twin arithmetic exactly
    base_df = spark.createDataFrame(BASELINE_MIX, SCHEMA)
    shift_df = spark.createDataFrame(SHIFTED_MIX, SCHEMA)
    expected = chi2_against(
        class_counts(base_df).collect()[0], class_counts(shift_df).collect()[0]
    )
    assert readings[2] == expected


def test_drift_replay_is_idempotent(spark, tmp_path):
    """Re-running the fold for an already-scored batch must leave the
    baseline and the reading unchanged."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write(src / "a.jsonl", BASELINE_MIX)
    _run(spark, src, sink, ckpt)
    before = {
        tuple(r) for r in latest_readings(spark, str(sink)).collect()
    }
    # second availableNow run with no new files: no new batches, no
    # mutation of existing readings
    _run(spark, src, sink, ckpt)
    after = {
        tuple(r) for r in latest_readings(spark, str(sink)).collect()
    }
    assert after == before


def test_drift_baseline_persists_across_restart(spark, tmp_path):
    """A restarted monitor must score new batches against the ORIGINAL
    baseline (persisted in the sink), not re-baseline on its first
    post-restart batch."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write(src / "a.jsonl", BASELINE_MIX)
    _run(spark, src, sink, ckpt)
    # restart with a shifted batch: if the monitor re-baselined, the
    # new batch would score 0 against itself
    _write(src / "b.jsonl", SHIFTED_MIX)
    _run(spark, src, sink, ckpt)
    readings = {
        r.batch_id: r.chi2 for r in latest_readings(spark, str(sink)).collect()
    }
    assert readings[0] == 0.0
    assert readings[1] > 50.0  # scored against the ORIGINAL baseline


def test_latest_readings_gates_on_success_marker(spark, tmp_path):
    """A partial (crash mid-write) reading batch dir without _SUCCESS
    must be invisible until the replay overwrites it — same
    completeness gate as the trending/sampling/CDC sink readers."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write(src / "a.jsonl", BASELINE_MIX)
    _run(spark, src, sink, ckpt)
    committed = {tuple(r) for r in latest_readings(spark, str(sink)).collect()}
    # simulate a crashed batch: dir exists, no _SUCCESS, torn file
    partial = sink / "reading" / "batch=999"
    partial.mkdir(parents=True)
    (partial / "part-00000.parquet").write_bytes(b"\x00\x01 not parquet")
    after = {tuple(r) for r in latest_readings(spark, str(sink)).collect()}
    assert after == committed


def test_drift_malformed_baseline_fails_typed(spark, tmp_path):
    """A baseline dir holding anything but exactly one class_counts
    row (corrupted / foreign content) must fail with the typed
    re-baseline message, never score against an arbitrary row."""
    import pytest

    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    # plant a two-row "baseline" with a _SUCCESS marker so the
    # completeness gate accepts it and the shape check is what fires
    base_df = spark.createDataFrame(BASELINE_MIX, SCHEMA)
    counts = class_counts(base_df).collect()[0]
    spark.createDataFrame([counts, counts]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(sink / "baseline"))
    _write(src / "a.jsonl", BASELINE_MIX)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_drift_monitor(spark, stream, str(sink), str(ckpt))
    with pytest.raises(Exception, match="exactly one class_counts row"):
        q.awaitTermination(120)
        q.processAllAvailable()
