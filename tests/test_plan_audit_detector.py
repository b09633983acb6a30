"""Unit tests for scripts/plan_audit.py::count_global_windows — the
unpartitioned-window anti-pattern detector must count exactly the
single-task sites: ordered windows with no partition spec and bare
whole-frame aggregates, while ignoring partitioned windows (ordered
or not) and rank-filter sites Catalyst bounds with a
TakeOrderedAndProject below the window."""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "scripts")
from plan_audit import count_global_windows  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _base(spark):
    return spark.range(100).select(
        "id", (F.col("id") % 7).alias("k"), (F.col("id") % 3).alias("v")
    )


def test_partitioned_ordered_not_counted(spark):
    w = Window.partitionBy("k").orderBy("v")
    assert count_global_windows(_plan(_base(spark).withColumn("r", F.row_number().over(w)))) == 0


def test_partitioned_unordered_not_counted(spark):
    w = Window.partitionBy("k")
    assert count_global_windows(_plan(_base(spark).withColumn("m", F.min("v").over(w)))) == 0


def test_global_ordered_counted(spark):
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    assert count_global_windows(_plan(_base(spark).withColumn("c", F.sum("v").over(w)))) == 1


def test_bare_global_aggregate_counted(spark):
    w = Window.partitionBy()
    assert count_global_windows(_plan(_base(spark).withColumn("t", F.sum("v").over(w)))) == 1


def test_rank_filter_bounded_not_counted(spark):
    """Filter(rnk <= k) over a global row_number compiles to
    TakeOrderedAndProject below the Window — input is k rows."""
    w = Window.orderBy(F.col("v").desc(), "id")
    df = (
        _base(spark)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert count_global_windows(plan) == 0


def test_mixed_plan_counts_only_global_sites(spark):
    wp = Window.partitionBy("k").orderBy("v")
    wg = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    df = (
        _base(spark)
        .withColumn("r", F.row_number().over(wp))
        .withColumn("c", F.sum("v").over(wg))
    )
    assert count_global_windows(_plan(df)) == 1


def test_unwaived_global_window_not_swallowed_by_other_waiver(spark):
    """Regression (round-11 review): a WAIVERS entry written for a
    different anti-pattern (exchange count) must NOT swallow an
    unwaived GLOBAL_WINDOW mark — the single-task class is always a
    hard flag."""
    from types import SimpleNamespace

    import plan_audit as pa

    def bad_query(s, sf_dir):
        w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
        return _base(s).withColumn("c", F.sum("v").over(w))

    specs = {"fake_q": SimpleNamespace(fn=bad_query)}
    old_w = dict(pa.WAIVERS)
    try:
        pa.WAIVERS["fake_q"] = "multi-stage exchange waiver (not windows)"
        flags, rows = pa.audit(spark, specs)
    finally:
        pa.WAIVERS.clear()
        pa.WAIVERS.update(old_w)
    assert any("fake_q" in f and "GLOBAL_WINDOW" in f for f in flags)
