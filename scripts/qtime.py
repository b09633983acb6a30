"""Isolate and time individual queries warm (guide §1.1/§1.4).

Usage: python scripts/qtime.py [--noop] [--runs N] <query...>

Times each named query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]: one untimed warm run, then N timed runs,
reporting best/median. --noop times ``df.write.format("noop")`` (full
materialization of every column) instead of bench.py's ``count()``;
both are printed-labelled so Spark UI runs stay readable. This is an
iteration tool — the committed record stays bench.py's.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from target_hdfs_spark.registry import all_queries
from target_hdfs_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    use_noop = "--noop" in args
    args = [a for a in args if a != "--noop"]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qtime")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def run(name: str) -> None:
        df = specs[name].fn(spark, sf_dir)
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        run(name)
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            run(name)
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: best={min(samples):.3f}s"
            f" median={statistics.median(samples):.3f}s"
            f" n={runs} mode={'noop' if use_noop else 'count'}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
