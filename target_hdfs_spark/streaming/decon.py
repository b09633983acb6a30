"""Streaming decontamination gate: q260's Bloom probe applied to an
ARRIVING document stream — the shape a live ingest pipeline runs so
benchmark-contaminated documents never reach the training corpus in
the first place.

The filter is built ONCE at stream start from the eval/benchmark
document set (the deterministic 4-hash/64K-bit Bloom of
`operators/curation.py::decon_bits_frame` — the identical bitset
q260 calibrates, via the same shared position formula, so the batch
calibration's no-false-negatives guarantee and measured fp rate apply
verbatim to the stream). Each micro-batch is probed MAP-SIDE
(positions recomputed per gram + K broadcast lookups — no gram-keyed
shuffle of the arriving corpus) and routed: clean documents to the
accept sink, flagged documents to a quarantine sink for the exact
recheck.

Exactly-once effect without a transaction log: every batch writes
both routes in OVERWRITE mode to `batch_id=<n>` directories (the
idempotent-foreachBatch pattern of streaming/curation.py) — a
replayed batch recomputes the same deterministic routing and
overwrites the same two directories, so neither route can accumulate
duplicates and a document can never end up in both.

No oracle entry: streaming triggers/checkpoints are not
SQL-expressible; batch parity (stream routing == q260's batch flags),
the no-false-negatives guarantee against the exact gram join, and
restart idempotence are proven in tests/test_streaming_decon.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from target_hdfs_spark.operators.curation import (
    decon_bits_frame,
    decon_probe_flags,
)


def decon_stream(
    spark: SparkSession,
    source_dir: str,
    eval_docs: DataFrame,
    clean_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream parquet document files through the Bloom gate.

    Per micro-batch: probe every document against the (localCheckpoint-
    pinned) eval bitset and split — `bloom_flagged` rows overwrite
    ``quarantine_dir/batch_id=<n>``, the rest ``clean_dir/
    batch_id=<n>``. The bitset is computed once here, NOT per batch:
    the benchmark suite is fixed for the life of the stream, and the
    probe's cost per batch is K broadcast lookups over the batch's
    grams.

    Scale shape: the filter is 64K positions regardless of corpus or
    stream length (8 KB of bits — the broadcast is constant-size
    forever); per-batch work is one gram explode + map-side probe +
    one per-doc aggregate; no state store at all — the gate is
    stateless by construction, so there is nothing to TTL, snapshot,
    or recover beyond the source offsets in the checkpoint.
    """
    bits = decon_bits_frame(eval_docs).localCheckpoint()
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        flags = decon_probe_flags(batch_df, bits)
        routed = batch_df.join(flags, "doc_id", "left").withColumn(
            "bloom_flagged",
            F.coalesce("bloom_flagged", F.lit(False)),
        )
        routed.persist()
        try:
            routed.where(~F.col("bloom_flagged")).drop(
                "bloom_flagged"
            ).write.mode("overwrite").parquet(
                f"{clean_dir}/batch_id={batch_id}"
            )
            routed.where(F.col("bloom_flagged")).drop(
                "bloom_flagged"
            ).write.mode("overwrite").parquet(
                f"{quarantine_dir}/batch_id={batch_id}"
            )
        finally:
            routed.unpersist()

    writer = raw.writeStream.foreachBatch(gate_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_route(spark: SparkSession, route_dir: str) -> DataFrame:
    """A route's documents across all committed batches (batch_id is a
    layout partition column, dropped from the logical view)."""
    return (
        spark.read.option("basePath", route_dir)
        .parquet(route_dir)
        .drop("batch_id")
    )
