"""Streaming priority sampling (S-surface twin of q121): maintain a
fixed-size weighted random sample of an UNBOUNDED document stream.

Priority sampling (Duffield-Lund-Thorup) is mergeable: the top-k by
priority of a union is the top-k of the unions' top-k's. So each
micro-batch computes its documents' priorities (same hash-derived
uniform as q121 — deterministic, so replays score identically),
unions them with the current sample snapshot, and writes the new
top-k as the next snapshot version.

Snapshot protocol (idempotent under foreachBatch replay, crash-safe):
snapshots live at ``<sink>/snap=<batch_id>``; a reader takes the
highest COMPLETE version (Spark's partition-dir write is
committer-atomic per directory). A replayed batch recomputes from
snapshot ``< batch_id`` — its own half-written output is never its
input — and overwrites its directory with identical content
(deterministic priorities ⇒ deterministic top-k).

Scale: per trigger the work is O(batch + k): batch priorities are
scan-side expressions, the union with k prior rows is tiny, and the
top-k compiles to TakeOrderedAndProject. State lives in the sink as
k rows — nothing unbounded anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from target_hdfs_spark.functions.hashing import md5_hash32


def doc_priority(weight_col: str = "n_chars") -> F.Column:
    """The q121 priority expression: weight / hash-uniform(0,1]."""
    u = (
        md5_hash32(F.concat(F.lit("pri|"), F.col("doc_id").cast("string")))
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    return F.col(weight_col).cast("double") / u


def latest_sample(spark: SparkSession, sink_dir: str) -> DataFrame | None:
    """The current sample: rows of the highest snapshot version."""
    if not os.path.isdir(sink_dir):
        return None
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(sink_dir)
        if d.startswith("snap=")
    ]
    if not versions:
        return None
    path = f"{sink_dir}/snap={max(versions)}"
    return spark.read.parquet(path)


def stream_priority_sample(
    spark: SparkSession,
    docs: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    k: int = 50,
    weight_col: str = "n_chars",
) -> StreamingQuery:
    """Start the sampler on a streaming document frame with
    (doc_id, <weight_col>, ...). Each trigger folds the batch into
    the running top-k sample and writes snapshot ``snap=<batch_id>``.
    """
    cols = docs.columns

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = batch_df.select(*cols, doc_priority(weight_col).alias("priority"))
        # strictly-earlier snapshot only: a replayed batch must not
        # read its own half-written output
        prior_versions = (
            [
                int(d.split("=", 1)[1])
                for d in os.listdir(sink_dir)
                if d.startswith("snap=")
            ]
            if os.path.isdir(sink_dir)
            else []
        )
        prior = [v for v in prior_versions if v < batch_id]
        if prior:
            current = batch_df.sparkSession.read.parquet(
                f"{sink_dir}/snap={max(prior)}"
            )
            scored = scored.unionByName(current)
        topk = scored.orderBy(F.col("priority").desc(), "doc_id").limit(k)
        topk.write.mode("overwrite").parquet(f"{sink_dir}/snap={batch_id}")

    return (
        docs.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
