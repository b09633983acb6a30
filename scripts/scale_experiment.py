"""Synthetic scale sweep for the sketch pipelines (round-2 verdict
item 7): build 10x / 100x versions of the sf0.1 documents table in
/tmp and measure q42 / q43 / q85 / q116 on them.

Corpus construction: documents x a copy-index frame (a shuffle-free
fan-out), with every token suffixed by the copy index
(`regexp_replace(text, '(\\S+)', '$1_cN')`). Why the token rewrite:
plain copies would make every document a 100-way near-duplicate of
its clones — a degenerate corpus where pair volume is quadratic in
the copy count and every bucket goes hot. Suffixing all tokens makes
cross-copy shingle overlap exactly zero while keeping each copy's
internal duplicate/near-duplicate structure bit-identical to sf0.1 —
so a Kx corpus has K times the documents AND K times the duplicate
pairs: constant duplicate density, which is what "more data" means
for a dedup pipeline.

Usage: python scripts/scale_experiment.py [factors...]  (default 10 100)
Writes /tmp/spark_graft_scale/scale<K>/documents.parquet once
(reused if present) and prints per-query best-of-2 warm timings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from target_hdfs_spark.registry import all_queries
from target_hdfs_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
QUERIES = (
    "q42_minhash_signatures",
    "q43_minhash_lsh_pairs",
    "q85_dedup_clusters",
    "q116_incremental_dedup",
)
ID_STRIDE = 10_000_000


def build(spark, factor: int) -> str:
    out = f"{ROOT}/scale{factor}"
    dest = f"{out}/documents.parquet"
    if os.path.exists(dest):
        return out
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    scaled = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_copy") * ID_STRIDE).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit(r"$1_c"), F.col("_copy").cast("string")),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled.repartition(32).write.mode("overwrite").parquet(dest)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark(app_name="scale_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for factor in [1, *factors]:
        sf_dir = SRC if factor == 1 else build(spark, factor)
        for name in QUERIES:
            spec = specs[name]
            spec.fn(spark, sf_dir).count()  # warm
            best, rows = 1e9, 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = spec.fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            print(
                f"factor={factor:>3} {name}: {best:6.2f}s  ({rows} rows)",
                flush=True,
            )


if __name__ == "__main__":
    main()
