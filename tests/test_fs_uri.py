"""Explicit-URI integration tests: run the writer / upsert /
compaction jobs against `file://` URIs so the Hadoop FileSystem
URI-resolution machinery is exercised end-to-end — the identical code
path an `hdfs://namenode/...` URI takes (Path.getFileSystem on the
scheme), minus the NameNode. Round-1 gap: everything was tested via
bare local paths, which short-circuit scheme resolution."""

from __future__ import annotations

import glob

from target_hdfs_spark.config import TargetConfig
from target_hdfs_spark.plans.compaction import compact_directory
from target_hdfs_spark.plans.upsert import upsert
from target_hdfs_spark.plans.writer import write_stream


def test_write_stream_file_uri(spark, tmp_path):
    uri = f"file://{tmp_path}/stream"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    config = TargetConfig(destination_path=f"file://{tmp_path}")
    write_stream(spark, df, uri, config, rows_per_file=10)
    # visible both through the URI and the bare path
    assert spark.read.parquet(uri).count() == 2
    assert glob.glob(f"{tmp_path}/stream/*.parquet")


def test_upsert_file_uri_partitioned(spark, tmp_path):
    uri = f"file://{tmp_path}/t"
    base = spark.createDataFrame(
        [(1, "de", 1.0), (2, "fr", 2.0)], "k long, country string, v double"
    )
    upsert(spark, base, uri, keys=["k"], partition_col="country")
    updates = spark.createDataFrame(
        [(1, "de", 9.0), (3, "us", 3.0)], "k long, country string, v double"
    )
    upsert(spark, updates, uri, keys=["k"], partition_col="country")
    got = {r.k: (r.country, r.v) for r in spark.read.parquet(uri).collect()}
    assert got == {1: ("de", 9.0), 2: ("fr", 2.0), 3: ("us", 3.0)}


def test_compaction_file_uri(spark, tmp_path):
    uri = f"file://{tmp_path}/t"
    for i in range(3):
        spark.createDataFrame([(i, "x")], "k long, s string").coalesce(1).write.mode(
            "append"
        ).parquet(uri)
    report = compact_directory(spark, uri, size_limit=10 * 1024 * 1024)
    assert report.files_compacted == 3
    assert spark.read.parquet(uri).count() == 3
