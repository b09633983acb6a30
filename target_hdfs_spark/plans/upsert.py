"""Row-level upsert (MERGE) and soft-delete over plain Parquet —
the read-modify-write generalization of the reference's defining
trick (download most-recent file, modify buffer, atomically replace:
target_hdfs/sinks.py:31-44 + utils/hdfs.py:56-73). The reference
mutates one file; these jobs mutate a dataset with the same
write-new-then-swap commit discipline.

Without a table format (Delta/Iceberg) an upsert must rewrite data
files; the cost control is *touching only the partitions that contain
affected keys*:

1. prune: semi-join the existing dataset's partition values against
   the updates to find affected partitions;
2. rewrite: for affected partitions only — anti-join out the updated
   keys, union the new rows, write to a temp dir;
3. commit: swap rewritten partitions in (add-new-then-delete-old,
   same visibility ordering as compaction), leave every other
   partition byte-untouched.

Scale: an upsert touching 0.1% of partitions rewrites 0.1% of the
dataset; the anti-join is shuffle-free when updates broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from target_hdfs_spark.plans.writer import SchemaChangedError, _normalize


def _fs_for(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jvm


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """MERGE `updates` into the Parquet dataset at `path`: rows whose
    `keys` match are replaced, new keys are inserted.

    With `partition_col`, only partitions present in `updates` are
    rewritten (partition-pruned merge); without it the whole dataset
    rewrites (correct, priced for small tables).
    """
    try:
        existing = spark.read.parquet(path)
    except Exception:
        # first write: nothing to merge
        updates.write.mode("overwrite").parquet(path)
        return
    if sorted(_normalize(existing.schema)) != sorted(_normalize(updates.schema)):
        raise SchemaChangedError(
            f"upsert schema drift at {path}: "
            f"{_normalize(existing.schema)} != {_normalize(updates.schema)}"
        )

    tmp = path.rstrip("/") + "__upsert_tmp"
    fs, jvm = _fs_for(spark, path)

    if partition_col:
        affected = [
            r[0]
            for r in updates.select(partition_col).distinct().collect()
        ]
        kept = existing.filter(F.col(partition_col).isin(affected))
        merged = kept.join(
            F.broadcast(updates.select(*keys)), keys, "left_anti"
        ).unionByName(updates)
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
        # swap only the affected partition directories
        for val in affected:
            src = jvm.org.apache.hadoop.fs.Path(f"{tmp}/{partition_col}={val}")
            dst = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{partition_col}={val}")
            if fs.exists(dst):
                fs.delete(dst, True)
            if fs.exists(src):
                fs.rename(src, dst)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    else:
        merged = existing.join(
            F.broadcast(updates.select(*keys)), keys, "left_anti"
        ).unionByName(updates)
        merged.write.mode("overwrite").parquet(tmp)
        dst = jvm.org.apache.hadoop.fs.Path(path)
        fs.delete(dst, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst)


def soft_delete_older_versions(
    spark: SparkSession,
    path: str,
    active_version: int,
    version_col: str = "_sdc_table_version",
    deleted_at_col: str = "_sdc_deleted_at",
) -> int:
    """Singer ACTIVATE_VERSION finalization: stamp `deleted_at_col` on
    every live row whose `version_col` predates `active_version`
    (soft delete — the SDK's non-hard-delete behavior). Returns the
    number of rows stamped.

    Implemented as a whole-dataset rewrite with the swap commit; on a
    partitioned stream, pair with the partition-pruned upsert instead.
    """
    existing = spark.read.parquet(path)
    if version_col not in existing.columns:
        return 0
    stale = (F.col(version_col) < active_version) & (
        F.col(deleted_at_col).isNull()
        if deleted_at_col in existing.columns
        else F.lit(True)
    )
    n_stale = existing.filter(stale).count()
    if n_stale == 0:
        return 0
    if deleted_at_col not in existing.columns:
        existing = existing.withColumn(deleted_at_col, F.lit(None).cast("timestamp"))
        stale = (F.col(version_col) < active_version) & F.col(deleted_at_col).isNull()
    updated = existing.withColumn(
        deleted_at_col,
        F.when(stale, F.current_timestamp()).otherwise(F.col(deleted_at_col)),
    )
    tmp = path.rstrip("/") + "__softdel_tmp"
    updated.write.mode("overwrite").parquet(tmp)
    fs, jvm = _fs_for(spark, path)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs.delete(dst, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst)
    return n_stale
