"""DuckDB twin of bench.py: run each headline query's oracle SQL on
the same parquet at the same SF, best-of-3, so BENCH_NOTES can keep
the Spark-vs-DuckDB table honest round over round.

Usage: python scripts/duckdb_bench.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from bench import HEADLINE
from target_hdfs_spark.registry import all_queries
from tests.oracle_compare import duckdb_conn

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    specs = all_queries()
    con = duckdb_conn(SF_DIR)
    total = 0.0
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None or spec.oracle is None:
            print(f"{name}: no oracle")
            continue
        con.execute(spec.oracle).fetchall()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name}: {best:.3f}s", flush=True)
    print(f"total: {total:.3f}s")


if __name__ == "__main__":
    main()
