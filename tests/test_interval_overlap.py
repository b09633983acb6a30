"""interval_overlap_join property tests: the binned equi-join must
emit exactly the pairs a brute-force inequality join emits — once
each — including intervals spanning many buckets, touching bucket
boundaries, and nested/identical intervals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from target_hdfs_spark.operators.analytics import interval_overlap_join

W = 100  # small bucket width so crafted intervals span many buckets


def _overlaps(a: tuple[int, int], b: tuple[int, int]) -> bool:
    return a[0] < b[1] and b[0] < a[1]


CASES = [
    # (left intervals, right intervals) as half-open [start, end)
    (
        [(0, 1000), (50, 150), (990, 1010), (2000, 2001)],
        [(100, 400), (999, 1000), (0, 5000), (1000, 1100)],
    ),
    # boundary-exact: ends landing exactly on bucket edges
    (
        [(0, 100), (100, 200), (199, 201)],
        [(99, 100), (100, 101), (200, 300)],
    ),
    # nested and identical intervals
    (
        [(0, 1000), (0, 1000), (400, 600)],
        [(450, 550), (0, 1000)],
    ),
]


@pytest.mark.parametrize("lefts,rights", CASES)
def test_matches_brute_force_exactly_once(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(lefts)], "lid long, s_start long, s_end long"
    )
    right = spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(rights)], "rid long, i_start long, i_end long"
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(left, right, W).select("lid", "rid").collect()
    )
    want = sorted(
        (i, j)
        for i, a in enumerate(lefts)
        for j, b in enumerate(rights)
        if _overlaps(a, b)
    )
    assert got == want  # exactly the overlap set, each pair once


def test_long_interval_spanning_many_buckets_counted_once(spark):
    # one left interval covering 50 buckets; right fully inside it
    left = spark.createDataFrame([(1, 0, 5000)], "lid long, s_start long, s_end long")
    right = spark.createDataFrame(
        [(7, 1234, 4321)], "rid long, i_start long, i_end long"
    )
    rows = interval_overlap_join(left, right, W).collect()
    assert len(rows) == 1


def test_no_nested_loop_join(spark):
    left = spark.range(10).select(
        F.col("id").alias("lid"),
        (F.col("id") * 100).alias("s_start"),
        (F.col("id") * 100 + 150).alias("s_end"),
    )
    right = spark.range(10).select(
        F.col("id").alias("rid"),
        (F.col("id") * 90).alias("i_start"),
        (F.col("id") * 90 + 50).alias("i_end"),
    )
    plan = (
        interval_overlap_join(left, right, W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
