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


def _swap_dirs(fs, jvm, new_dir: str, dst_dir: str) -> None:
    """Atomic-ish directory replacement without a no-data window:
    stage old aside, rename new in, delete old — a crash leaves
    either the old or the new dataset in place, never neither
    (the delete-then-rename alternative has a gap where readers see
    nothing)."""
    dst = jvm.org.apache.hadoop.fs.Path(dst_dir)
    old = jvm.org.apache.hadoop.fs.Path(dst_dir.rstrip("/") + "__old")
    new = jvm.org.apache.hadoop.fs.Path(new_dir)
    if fs.exists(old):
        fs.delete(old, True)
    had_old = fs.exists(dst)
    if had_old and not fs.rename(dst, old):
        raise OSError(f"swap: could not stage old dataset {dst}")
    if not fs.rename(new, dst):
        if had_old:
            fs.rename(old, dst)  # roll back
        raise OSError(f"swap: could not commit new dataset {dst}")
    if had_old:
        fs.delete(old, True)


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
        kept = existing.filter(
            F.col(partition_col).isin(affected)
            if None not in affected
            else (F.col(partition_col).isin([v for v in affected if v is not None])
                  | F.col(partition_col).isNull())
        )
        merged = kept.join(
            F.broadcast(updates.select(*keys)), keys, "left_anti"
        ).unionByName(updates)
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
        # Swap the partition directories Spark ACTUALLY wrote: the
        # tmp listing carries the hive-escaped names (%XX escapes,
        # __HIVE_DEFAULT_PARTITION__ for null) — reconstructing them
        # from raw Python values would miss escaped/null partitions
        # and silently drop their updates.
        tmp_jpath = jvm.org.apache.hadoop.fs.Path(tmp)
        for status in fs.listStatus(tmp_jpath):
            name = status.getPath().getName()
            if not status.isDirectory() or "=" not in name:
                continue
            dst = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{name}")
            old = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{name}__old")
            if fs.exists(old):
                fs.delete(old, True)
            had_old = fs.exists(dst)
            if had_old and not fs.rename(dst, old):
                raise OSError(f"upsert: could not stage old partition {dst}")
            if not fs.rename(status.getPath(), dst):
                # roll back so the dataset keeps the old partition
                if had_old:
                    fs.rename(old, dst)
                raise OSError(f"upsert: could not commit partition {dst}")
            if had_old:
                fs.delete(old, True)
        fs.delete(tmp_jpath, True)
    else:
        merged = existing.join(
            F.broadcast(updates.select(*keys)), keys, "left_anti"
        ).unionByName(updates)
        merged.write.mode("overwrite").parquet(tmp)
        _swap_dirs(fs, jvm, tmp, path)


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
    _swap_dirs(fs, jvm, tmp, path)
    return n_stale
