"""applyInPandasWithState operator test: state must persist across
micro-batches (the detector's running statistics include batch-1
events when scoring batch-2 events)."""

from __future__ import annotations

import json
import time

from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark
from target_hdfs_spark.streaming.stateful import running_zscore_anomalies

SCHEMA = {
    "properties": {
        "user_id": {"type": "integer"},
        "event_id": {"type": "integer"},
        "ts": {"type": "string", "format": "date-time"},
        "value": {"type": "number"},
    }
}


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_state_persists_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    base = [
        {"user_id": 1, "event_id": i, "ts": f"2026-08-13T10:00:{i:02d}Z", "value": 10.0 + (i % 2)}
        for i in range(8)
    ]
    _write(src / "f1.jsonl", base)
    time.sleep(1.1)
    # batch 2: one normal event, one wild outlier
    _write(
        src / "f2.jsonl",
        [
            {"user_id": 1, "event_id": 100, "ts": "2026-08-13T10:01:00Z", "value": 10.5},
            {"user_id": 1, "event_id": 101, "ts": "2026-08-13T10:01:01Z", "value": 500.0},
        ],
    )

    schema = jsonschema_to_spark(SCHEMA)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    anomalies = running_zscore_anomalies(stream, threshold=3.0)
    q = (
        anomalies.writeStream.format("memory")
        .queryName("anom_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM anom_t").collect()
    # only the outlier fires; its n_prior counts batch-1 events too,
    # proving state crossed the micro-batch boundary
    assert [r.event_id for r in rows] == [101]
    assert rows[0].n_prior == 9  # 8 from batch 1 + 1 earlier in batch 2
    assert abs(rows[0].zscore) > 3.0


def test_no_anomalies_below_min_prior(spark, tmp_path):
    src = tmp_path / "src"
    _write(
        src / "f1.jsonl",
        [
            {"user_id": 2, "event_id": 1, "ts": "2026-08-13T10:00:00Z", "value": 1.0},
            {"user_id": 2, "event_id": 2, "ts": "2026-08-13T10:00:01Z", "value": 999.0},
        ],
    )
    schema = jsonschema_to_spark(SCHEMA)
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        running_zscore_anomalies(stream, threshold=1.0)
        .writeStream.format("memory")
        .queryName("anom_cold")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM anom_cold").count() == 0
