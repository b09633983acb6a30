"""Streaming CDC apply (S-surface twin of q143): fold an unbounded
keyed change stream into a current-state snapshot with
last-writer-wins semantics and delete tombstones.

Rule (identical to the batch twin q143_cdc_last_writer_wins): per key,
the op with the greatest (ts, event_id) decides — an upsert survives
with its value, a delete removes the key from the visible state.
Because ``max`` over (ts, event_id) is associative and commutative,
the fold is MERGEABLE: applying batches in any grouping yields the
same final state as one pass over the union, which is what makes the
per-trigger incremental apply equal to the batch query.

Tombstones are RETAINED in the snapshot (op = 'delete' rows): a
late-arriving upsert that is OLDER than a key's delete must lose, and
it can only lose if the delete's timestamp is still present to compare
against. The public view (:func:`current_state`) filters them out.
The reference's at-least-once replay discipline
(reference/target_hdfs/__init__.py state emission after flush) is the
same contract this sink provides via idempotent versioned snapshots.

Snapshot protocol (shared with streaming/sampling.py): versions live
at ``<sink>/snap=<batch_id>``; readers take the highest _SUCCESS-
complete version; a replayed batch folds from versions STRICTLY
earlier than itself and overwrites its own directory with identical
content (the fold is deterministic), so crashes anywhere between
write and checkpoint commit cannot duplicate or lose effects. Old
versions are pruned after each successful write.

Scale: per trigger the work is O(batch + |live keys|). At 100 TB of
accumulated changes the snapshot holds one row per key — the same
bound a MERGE-maintained table has. When |keys| outgrows a single
snapshot rewrite, the same fold partitions by key range (hive
``partition_col`` on the snapshot, rewritten only for partitions the
batch touches — plans/upsert.py implements exactly that pruning for
the batch MERGE path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from target_hdfs_spark.streaming.sampling import (
    KEEP_SNAPSHOTS,
    _prune_snapshots,
    _snapshot_versions,
)

_STATE_COLS = ("user_id", "op", "value", "ts", "event_id")


def classify_ops(events: DataFrame) -> DataFrame:
    """Map raw events to change-log ops (q143's rule: event_type
    'error' is a delete tombstone, everything else upserts)."""
    return events.select(
        "user_id",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        "value",
        "ts",
        "event_id",
    )


def latest_per_key(changes: DataFrame) -> DataFrame:
    """Reduce a change set to the winning row per key — max
    (ts, event_id), the associative core of the fold. Compiles to
    WindowGroupLimit (per-partition top-1) like the batch twin."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def current_state(spark: SparkSession, sink_dir: str) -> DataFrame | None:
    """The visible state: latest complete snapshot minus tombstones,
    in the batch twin's output schema."""
    versions = _snapshot_versions(spark, sink_dir)
    if not versions:
        return None
    snap = spark.read.parquet(f"{sink_dir}/snap={max(versions)}")
    return snap.filter(F.col("op") == "upsert").select(
        "user_id",
        F.col("value").alias("final_value"),
        F.col("ts").alias("updated_at"),
    )


def stream_cdc_apply(
    spark: SparkSession,
    events: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the CDC fold on a streaming event frame with
    (user_id, event_id, ts, value, event_type). Each trigger merges
    the batch's winning ops with the prior snapshot and writes
    ``snap=<batch_id>``.
    """

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch_changes = latest_per_key(classify_ops(batch_df))
        prior = [v for v in _snapshot_versions(sess, sink_dir) if v < batch_id]
        if prior:
            prev = sess.read.parquet(f"{sink_dir}/snap={max(prior)}").select(
                *_STATE_COLS
            )
            merged = latest_per_key(prev.unionByName(batch_changes.select(*_STATE_COLS)))
        else:
            merged = batch_changes
        # NO coalesce(1): the snapshot frame grows with key
        # cardinality, and a forced single-partition write makes the
        # snapshot task the micro-batch straggler at large key spaces
        # (r6 verdict item 4). latest_per_key ends in a hash Exchange,
        # so AQE's advisory-size coalescing already yields one file
        # while the state is small and fans the write out as the key
        # space grows — scaling in both directions with zero extra
        # jobs (no count, no persist).
        merged.select(*_STATE_COLS).write.mode("overwrite").parquet(
            f"{sink_dir}/snap={batch_id}"
        )
        _prune_snapshots(sess, sink_dir, KEEP_SNAPSHOTS)

    return (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
