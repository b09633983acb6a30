"""CLI for the small-file compaction job:

    python -m target_hdfs_spark.compact --path hdfs://.../stream \
        [--size-limit 100M] [--partitioned]

The operational twin of the reference's implicit append-to-recent
behavior, runnable on a schedule (reference rationale:
target_hdfs/utils/hdfs.py:91-117; design SURVEY.md §4.3)."""

from __future__ import annotations

import argparse
import json

from target_hdfs_spark.config import convert_size_to_bytes
from target_hdfs_spark.plans.compaction import compact_stream
from target_hdfs_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="target-hdfs-spark-compact")
    parser.add_argument("--path", required=True, help="stream directory to compact")
    parser.add_argument(
        "--size-limit",
        default=None,
        help="files below this size are merged (e.g. 100M); default 85%% of FS block size",
    )
    parser.add_argument(
        "--partitioned",
        action="store_true",
        help="treat path as hive-partitioned; compact each partition dir",
    )
    parser.add_argument(
        "--compression",
        default="gzip",
        help="codec for rewritten files; match the dataset's configured "
        "compression_method (default gzip)",
    )
    parser.add_argument(
        "--format",
        default="parquet",
        choices=("parquet", "orc"),
        dest="fmt",
        help="data format of the stream (default parquet); an ORC "
        "stream compacted as parquet would silently no-op (suffix "
        "matches zero files)",
    )
    args = parser.parse_args(argv)

    spark = get_spark(app_name="target_hdfs_spark_compact")
    spark.sparkContext.setLogLevel("ERROR")
    limit = convert_size_to_bytes(args.size_limit) if args.size_limit else None
    reports = compact_stream(
        spark,
        args.path,
        limit,
        partitioned=args.partitioned,
        compression=args.compression,
        fmt=args.fmt,
    )
    for r in reports:
        print(
            json.dumps(
                {
                    "directory": r.directory,
                    "files_before": r.files_before,
                    "files_compacted": r.files_compacted,
                    "files_after": r.files_after,
                    "bytes_compacted": r.bytes_compacted,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
