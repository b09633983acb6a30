"""Crash-injection tests for the swap/commit protocols: kill the
process (simulated by raising from the FS proxy) between the renames
of each two-phase commit, then prove the next job heals the dataset
exactly — no lost rows, no duplicates, no bogus partitions.

Covers: unpartitioned upsert swap, per-partition upsert swap,
compaction manifest commit (both crash windows), zorder swap.
"""

from __future__ import annotations

import glob

import pytest

from target_hdfs_spark.plans import compaction as compaction_mod
from target_hdfs_spark.plans import upsert as upsert_mod
from target_hdfs_spark.plans.compaction import compact_directory
from target_hdfs_spark.plans.upsert import upsert
from target_hdfs_spark.plans.zorder import write_zordered


class CrashingFS:
    """Delegating proxy over the Hadoop FileSystem that raises at the
    N-th call of a given operation — the injected 'kill point'."""

    def __init__(self, real, crash_on: dict[str, int]):
        self._real = real
        self._crash_on = crash_on
        self._counts: dict[str, int] = {}

    def _tick(self, op: str) -> None:
        n = self._counts.get(op, 0) + 1
        self._counts[op] = n
        if self._crash_on.get(op) == n:
            # crash-once: the shared dict is cleared so the retry
            # (which installs a fresh proxy over the same dict) runs
            # clean — mirroring a process restart after a kill
            del self._crash_on[op]
            raise RuntimeError(f"injected crash at {op} #{n}")

    def rename(self, a, b):
        self._tick("rename")
        return self._real.rename(a, b)

    def delete(self, p, recursive=False):
        self._tick("delete")
        return self._real.delete(p, recursive)

    def __getattr__(self, name):
        return getattr(self._real, name)


@pytest.fixture
def inject_upsert_fs(monkeypatch):
    """Wrap the FS returned by upsert._fs_for with a CrashingFS."""

    def _install(crash_on: dict[str, int]):
        real_fs_for = upsert_mod._fs_for

        def crashing_fs_for(spark, path):
            fs, jvm = real_fs_for(spark, path)
            return CrashingFS(fs, crash_on), jvm

        monkeypatch.setattr(upsert_mod, "_fs_for", crashing_fs_for)

    yield _install


def test_upsert_crash_between_swap_renames(spark, tmp_path, inject_upsert_fs):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, s string"
    )
    base.write.parquet(path)

    # swap renames: #1 stages dst aside, #2 commits tmp -> dst.
    # Crash exactly between them.
    inject_upsert_fs({"rename": 2})
    updates = spark.createDataFrame([(2, "B2"), (3, "c")], "k long, s string")
    with pytest.raises(RuntimeError, match="injected crash"):
        upsert(spark, updates, path, keys=["k"])

    # dataset is stranded at path__old; a clean retry must heal + merge
    assert not glob.glob(f"{path}/*.parquet")
    assert glob.glob(f"{path}__old/*.parquet")
    upsert(spark, updates, path, keys=["k"])
    got = {r.k: r.s for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


def test_partitioned_upsert_crash_between_partition_renames(
    spark, tmp_path, inject_upsert_fs
):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "de", 1.0), (2, "fr", 2.0)], "k long, country string, v double"
    )
    base.write.partitionBy("country").parquet(path)

    # partition swap renames: #1 stages country=de aside, #2 commits.
    inject_upsert_fs({"rename": 2})
    updates = spark.createDataFrame(
        [(1, "de", 9.0)], "k long, country string, v double"
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        upsert(spark, updates, path, keys=["k"], partition_col="country")

    # the partition is stranded at country=de__old
    assert not glob.glob(f"{path}/country=de/*.parquet")
    assert glob.glob(f"{path}/country=de__old/*.parquet")

    # clean retry heals the stranded partition, then merges
    upsert(spark, updates, path, keys=["k"], partition_col="country")
    got = {r.k: (r.country, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("de", 9.0), 2: ("fr", 2.0)}
    assert not glob.glob(f"{path}/country=de__old")


def _make_small_files(spark, path, n=3):
    for i in range(n):
        spark.createDataFrame([(i, f"row{i}")], "k long, s string").coalesce(
            1
        ).write.mode("append").parquet(path)


@pytest.fixture
def inject_compaction_fs(monkeypatch):
    def _install(crash_on: dict[str, int]):
        real_fs = compaction_mod._fs

        def crashing_fs(spark, path):
            fs, jpath, jvm = real_fs(spark, path)
            return CrashingFS(fs, crash_on), jpath, jvm

        monkeypatch.setattr(compaction_mod, "_fs", crashing_fs)

    yield _install


def test_compaction_crash_after_manifest_before_moves(
    spark, tmp_path, inject_compaction_fs
):
    path = str(tmp_path / "t")
    _make_small_files(spark, path)
    before = spark.read.parquet(path).collect()

    # rename #1 publishes the manifest; rename #2 is the first file
    # move — crash right between intent and commit
    inject_compaction_fs({"rename": 2})
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_directory(spark, path, size_limit=10 * 1024 * 1024)

    # clean rerun completes the interrupted commit via the manifest
    compact_directory(spark, path, size_limit=10 * 1024 * 1024)
    after = spark.read.parquet(path).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    assert not glob.glob(f"{path}/_compact_manifest.json*")
    assert not glob.glob(f"{path}/_compact_tmp")


def test_compaction_crash_between_moves_and_deletes(
    spark, tmp_path, inject_compaction_fs
):
    path = str(tmp_path / "t")
    _make_small_files(spark, path)
    before = spark.read.parquet(path).collect()

    # all consolidated files moved in, crash before deleting any input
    # (delete #1 is the first input delete: no pre-existing tmp dir)
    inject_compaction_fs({"delete": 1})
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_directory(spark, path, size_limit=10 * 1024 * 1024)

    # on-disk state right now holds duplicates (new + old files); the
    # rerun must heal to the exact original rows, not bake them in
    compact_directory(spark, path, size_limit=10 * 1024 * 1024)
    after = spark.read.parquet(path).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    assert not glob.glob(f"{path}/_compact_manifest.json*")


def test_zorder_crash_between_swap_renames(spark, tmp_path, inject_upsert_fs):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(100)], "k long, a long, v double"
    )
    df.write.parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    inject_upsert_fs({"rename": 2})
    with pytest.raises(RuntimeError, match="injected crash"):
        write_zordered(spark.read.parquet(path), path, "k", "a")

    # the dataset is stranded at path__old; any engine job's entry
    # recovery heals it — exercised here via the public helper, then
    # the zorder rewrite reruns cleanly
    from target_hdfs_spark.plans.upsert import recover_dataset

    recover_dataset(spark, path)
    write_zordered(spark.read.parquet(path), path, "k", "a")
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
