"""Streaming stateful-operator scale sweep (round-6 verdict item 6):
drive the applyInPandasWithState twins over the fanned events corpus
(scale_experiment.build_events — Kx users at constant per-user
density) and record per-operator wall time, throughput, emitted rows,
and the state-store row count (stateOperators.numRowsTotal from the
query progress), at 1x / 10x / 100x.

What the numbers must show for the 100 TB argument:
- wall scales <= linearly in K (the stateful fold is map-side after
  the user_id shuffle; Kx users = Kx independent folds);
- state rows scale with the ACTIVE key population (= users for the
  no-TTL trackers, whose state is O(1) per user), not with events;
- throughput (rows/s) holds roughly constant across K — the Python
  per-row fold is the bottleneck and it parallelizes per key.

Usage: python scripts/streaming_scale.py [factors...]   (default 1 10)
       add 100 explicitly for the full sweep.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from target_hdfs_spark.session import get_spark


def _ops():
    from target_hdfs_spark.streaming.stateful import (
        bloom_filter_stream,
        bucket_batch_stream,
        clamped_balance_stream,
        countmin_stream,
        ema_stream,
        funnel_stage_stream,
        gapped_pattern_stream,
        kmv_distinct_stream,
        mg_heavy_hitters_stream,
        multi_pattern_stream,
        pack_offset_stream,
        dsir_model_stream,
        filter_agreement_stream,
        pii_scan_stream,
        quantile_stream,
        reservoir_stream,
        scd2_interval_stream,
        time_weighted_stream,
        transition_stream,
    )

    return {
        "multi_pattern_stream": multi_pattern_stream,
        "gapped_pattern_stream": gapped_pattern_stream,
        "funnel_stage_stream": funnel_stage_stream,
        "scd2_interval_stream": scd2_interval_stream,
        "time_weighted_stream": time_weighted_stream,
        "transition_stream": transition_stream,
        "ema_stream": ema_stream,
        "clamped_balance_stream": clamped_balance_stream,
        "kmv_distinct_stream": kmv_distinct_stream,
        # fixed probe set: users 1-8 exist at every factor (the events
        # fan-out strides user ids upward)
        "countmin_stream": lambda s: countmin_stream(
            s, tuple(range(1, 9))
        ),
        "bloom_filter_stream": lambda s: bloom_filter_stream(
            s, tuple(range(1, 9))
        ),
        # fixed probe percentiles (state is the dense histogram —
        # 8 KB/key regardless of stream length)
        "quantile_stream": lambda s: quantile_stream(s, (50, 90, 99)),
        # the sample IS the state (k (hash, id) pairs); emission rate
        # decays as ~k/n — the sweep pins wall AND that output stays
        # tiny at 100x
        "reservoir_stream": reservoir_stream,
        # the summary IS the state (<= 16 counters + offset); the
        # fifth sketch twin — emission decays once the heavy set
        # stabilizes
        "mg_heavy_hitters_stream": mg_heavy_hitters_stream,
        # docs-driven (see DOCS_OPS): online per-bucket packing offsets
        "pack_offset_stream": pack_offset_stream,
        # docs-driven: the length-bucketed batching ledger (24 B per
        # power-of-two bucket — state bounded at <= 12 rows forever)
        "bucket_batch_stream": bucket_batch_stream,
        # docs-driven: the PII scrub-audit ledger (40 B per pattern
        # class — state bounded at <= 3 rows forever)
        "pii_scan_stream": pii_scan_stream,
        # docs-driven: the online DSIR model fit (16 B per touched
        # feature bucket — state bounded at <= 1024 rows forever)
        "dsir_model_stream": dsir_model_stream,
        # docs-driven: the online filter-agreement ledger (32 B per
        # filter pair — state bounded at 6 rows forever)
        "filter_agreement_stream": filter_agreement_stream,
    }


def drive(spark, events_path: str, op_name: str, op, n_batches_hint: int) -> dict:
    """Run one operator over the events parquet as a file stream
    (availableNow, memory sink), returning the measurement row."""
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", max(1, 32 // n_batches_hint))
        .parquet(events_path)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
    name = f"sweep_{op_name}_{abs(hash(events_path)) % 10_000}"
    with tempfile.TemporaryDirectory() as ckpt:
        t0 = time.perf_counter()
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(3600)
        wall = time.perf_counter() - t0
        progress = sorted(q.recentProgress, key=lambda p: p["batchId"])
        state_rows = [
            op_row["numRowsTotal"]
            for p in progress
            for op_row in (p.get("stateOperators") or [])
        ]
        in_rows = sum(p["numInputRows"] for p in progress)
    out_rows = spark.sql(f"select count(*) n from {name}").collect()[0]["n"]
    spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
    return {
        "op": op_name,
        "wall_s": round(wall, 2),
        "input_rows": in_rows,
        "output_rows": out_rows,
        "rows_per_s": int(in_rows / wall) if wall > 0 else 0,
        "final_state_rows": state_rows[-1] if state_rows else 0,
        "max_state_rows": max(state_rows) if state_rows else 0,
    }


# operators that consume a DOCUMENTS stream (doc_id, text) rather than
# the events stream; driven from the scale corpus documents.parquet
DOCS_OPS = (
    "pack_offset_stream",
    "bucket_batch_stream",
    "pii_scan_stream",
    "dsir_model_stream",
    "filter_agreement_stream",
)


def drive_docs(spark, docs_path: str, op_name: str, op, n_batches_hint: int) -> dict:
    """Like drive(), over the documents parquet (doc_id, text)."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .option("maxFilesPerTrigger", max(1, 32 // n_batches_hint))
        .parquet(docs_path)
        .select("doc_id", "lang", "text")
    )
    name = f"sweep_{op_name}_{abs(hash(docs_path)) % 10_000}"
    with tempfile.TemporaryDirectory() as ckpt:
        t0 = time.perf_counter()
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(3600)
        wall = time.perf_counter() - t0
        progress = sorted(q.recentProgress, key=lambda p: p["batchId"])
        state_rows = [
            op_row["numRowsTotal"]
            for p in progress
            for op_row in (p.get("stateOperators") or [])
        ]
        in_rows = sum(p["numInputRows"] for p in progress)
    out_rows = spark.sql(f"select count(*) n from {name}").collect()[0]["n"]
    spark.catalog.dropTempView(name) if spark.catalog.tableExists(name) else None
    return {
        "op": op_name,
        "wall_s": round(wall, 2),
        "input_rows": in_rows,
        "output_rows": out_rows,
        "rows_per_s": int(in_rows / wall) if wall > 0 else 0,
        "final_state_rows": state_rows[-1] if state_rows else 0,
        "max_state_rows": max(state_rows) if state_rows else 0,
    }


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [1, 10]
    # --ops=substr[,substr]: restrict to matching operators
    pats = [
        p
        for a in sys.argv[1:]
        if a.startswith("--ops=")
        for p in a.split("=", 1)[1].split(",")
    ]
    spark = get_spark(app_name="streaming_scale")
    spark.sparkContext.setLogLevel("ERROR")
    import scale_experiment as se

    for factor in factors:
        # factor 1 also goes through build_events: the rewrite stores
        # proper micros timestamps (the raw sf0.1 file is
        # TIMESTAMP(NANOS), which a schema-pinned readStream rejects)
        events_path = f"{se.build_events(spark, factor)}/events.parquet"
        docs_path = None
        for op_name, op in _ops().items():
            if pats and not any(p in op_name for p in pats):
                continue
            if op_name in DOCS_OPS:
                if docs_path is None:
                    docs_path = f"{se.build(spark, factor)}/documents.parquet"
                row = drive_docs(spark, docs_path, op_name, op, n_batches_hint=4)
            else:
                row = drive(spark, events_path, op_name, op, n_batches_hint=4)
            print(f"factor={factor:>3} {row}", flush=True)


if __name__ == "__main__":
    main()
