"""Capture .explain('formatted') for a set of queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> <query...>
e.g.   python scripts/capture_plans.py r11 before q284_score_percentiles

Writes plans/<tag>/<query>_<suffix>.txt (one file per query). Planning
only — nothing is executed, so this is safe to run next to a bench.
"""

from __future__ import annotations

import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from target_hdfs_spark.registry import all_queries
from target_hdfs_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh, redirect_stdout(fh):
            df.explain("formatted")
        n_exchange = sum(
            1 for line in open(path) if "Exchange" in line.split("(")[0]
            or line.lstrip().startswith(("Exchange", "+- Exchange"))
        )
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
