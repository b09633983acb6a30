"""Range-partitioned layout writes (plans/range_layout.py): the
sketch-planned boundaries match q266's in-plan walk, the written
directories respect the ranges, the layout balances, and re-running
reproduces the identical layout (determinism — the property Spark's
own sampling-based repartitionByRange cannot give)."""

from __future__ import annotations

from pyspark.sql import functions as F

from target_hdfs_spark.plans.range_layout import (
    assign_range_id,
    plan_range_boundaries,
    write_range_partitioned,
)
from target_hdfs_spark.registry import all_queries
from target_hdfs_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"
PARTS = 8


def _lineitem(spark):
    return load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )


def test_boundaries_match_q266_planner(spark):
    """The driver-side walk and q266's in-plan walk are the same
    cut: each q266 partition's lo_value (beyond partition 0) is
    exactly one planned boundary, in order."""
    cuts = plan_range_boundaries(_lineitem(spark), "l_extendedprice", PARTS)
    q266 = (
        all_queries()["q266_range_partition_planner"]
        .fn(spark, SF_DIR)
        .orderBy("partition_id")
        .collect()
    )
    assert cuts == [r["lo_value"] for r in q266[1:]]


def test_written_layout_respects_ranges_and_balance(spark, tmp_path):
    df = _lineitem(spark)
    path = str(tmp_path / "range_ds")
    cuts = write_range_partitioned(df, "l_extendedprice", path, PARTS)
    assert len(cuts) == PARTS - 1
    back = spark.read.option("basePath", path).parquet(path)
    assert back.count() == df.count()
    stats = (
        back.groupBy("range_id")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("range_id")
        .collect()
    )
    assert [r["range_id"] for r in stats] == list(range(PARTS))
    bounds = [float("-inf")] + cuts + [float("inf")]
    for r in stats:
        lo_cut, hi_cut = bounds[r["range_id"]], bounds[r["range_id"] + 1]
        # floor-clamped bucket semantics: values live in [cut, next_cut)
        assert int(r["lo"]) >= lo_cut or r["range_id"] == 0
        assert int(r["hi"]) < hi_cut or hi_cut == float("inf")
    # equi-depth balance: no range holds more than ~3x the ideal
    # share (bucket granularity bounds the skew on this distribution)
    n = sum(r["n"] for r in stats)
    assert max(r["n"] for r in stats) <= 3 * (n // PARTS)


def test_layout_is_deterministic_across_runs(spark, tmp_path):
    df = _lineitem(spark)
    cuts1 = write_range_partitioned(
        df, "l_extendedprice", str(tmp_path / "a"), PARTS
    )
    cuts2 = write_range_partitioned(
        df, "l_extendedprice", str(tmp_path / "b"), PARTS
    )
    assert cuts1 == cuts2
    a = spark.read.option("basePath", str(tmp_path / "a")).parquet(
        str(tmp_path / "a")
    )
    b = spark.read.option("basePath", str(tmp_path / "b")).parquet(
        str(tmp_path / "b")
    )
    pa = {
        (r["l_orderkey"], r["range_id"])
        for r in a.select("l_orderkey", "range_id").collect()
    }
    pb = {
        (r["l_orderkey"], r["range_id"])
        for r in b.select("l_orderkey", "range_id").collect()
    }
    assert pa == pb


def test_assignment_is_map_side_only(spark):
    """The range_id assignment must be a folded constant expression:
    no join, no exchange in its plan fragment."""
    df = _lineitem(spark)
    cuts = plan_range_boundaries(df, "l_extendedprice", PARTS)
    assigned = assign_range_id(df, "l_extendedprice", cuts)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_reader_prunes_directories_and_stays_exact(spark, tmp_path):
    from target_hdfs_spark.plans.range_layout import read_range_pruned

    df = _lineitem(spark)
    path = str(tmp_path / "pruned_ds")
    cuts = write_range_partitioned(df, "l_extendedprice", path, PARTS)
    lo, hi = float(cuts[2]), float(cuts[4])  # a 2-range band of 8
    got = read_range_pruned(
        spark, path, "l_extendedprice", cuts, lo=lo, hi=hi
    )
    # exactness: identical row set to the unpartitioned filter
    expected = df.filter(
        (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") <= hi)
    )
    assert got.count() == expected.count()
    assert (
        got.agg(F.sum("l_orderkey")).first()[0]
        == expected.agg(F.sum("l_orderkey")).first()[0]
    )
    # pruning: the scan's partition filters kill the other directories
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "range_id" in plan
    n_ranges = got.select("range_id").distinct().count()
    assert n_ranges <= 3  # the band plus at most one edge range


def test_pruned_reader_is_exact_for_any_band(spark, tmp_path):
    """Exactness of the pruned read for bands in every alignment
    class: cut-aligned, mid-range, cross-range, whole-domain, and
    degenerate (lo == hi)."""
    from target_hdfs_spark.plans.range_layout import read_range_pruned

    df = _lineitem(spark)
    path = str(tmp_path / "band_ds")
    cuts = write_range_partitioned(df, "l_extendedprice", path, PARTS)
    bands = [
        (float(cuts[0]), float(cuts[1])),          # cut-aligned both ends
        (float(cuts[1]) + 0.5, float(cuts[2]) - 0.5),  # inside one range
        (float(cuts[0]) - 10.0, float(cuts[-1]) + 10.0),  # cross-all
        (None, float(cuts[3])),                    # open lower
        (float(cuts[3]), None),                    # open upper
        (float(cuts[2]), float(cuts[2])),          # degenerate point
    ]
    for lo, hi in bands:
        got = read_range_pruned(
            spark, path, "l_extendedprice", cuts, lo=lo, hi=hi
        )
        exp = df
        if lo is not None:
            exp = exp.filter(F.col("l_extendedprice") >= lo)
        if hi is not None:
            exp = exp.filter(F.col("l_extendedprice") <= hi)
        assert got.count() == exp.count(), (lo, hi)
        g = got.agg(F.sum("l_orderkey")).first()[0] or 0
        e = exp.agg(F.sum("l_orderkey")).first()[0] or 0
        assert g == e, (lo, hi)


from hypothesis import given, settings, strategies as st


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=1, max_size=300
    ),
    parts=st.integers(min_value=1, max_value=12),
)
def test_boundary_planner_invariants_any_distribution(spark, vals, parts):
    """For ANY integer distribution (uniform, constant, heavy-tailed,
    few-distinct) and any partition count: cuts are strictly
    ascending bucket-aligned values, at most parts-1 of them, every
    row lands in a valid range, ranges are contiguous from 0, and no
    range exceeds the equi-depth ceiling of ideal + the heaviest
    single bucket (the cut is bucket-granular, so one hot bucket is
    the irreducible skew floor)."""
    from collections import Counter

    from target_hdfs_spark.plans.range_layout import (
        assign_range_id,
        plan_range_boundaries,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cuts = plan_range_boundaries(df, "v", parts, width=16, nbkt=512)
    assert len(cuts) <= parts - 1
    assert cuts == sorted(set(cuts))
    assert all(c % 16 == 0 for c in cuts)
    assigned = [
        r["range_id"]
        for r in assign_range_id(df, "v", cuts, width=16, nbkt=512).collect()
    ]
    occupied = sorted(set(assigned))
    assert occupied[0] == 0 and occupied[-1] == len(cuts)
    assert occupied == list(range(len(cuts) + 1))  # no empty range
    n = len(vals)
    bucket_mass = Counter(min(max(v, 0), 16 * 512 - 1) // 16 for v in vals)
    ceiling = n // parts + max(bucket_mass.values())
    assert max(Counter(assigned).values()) <= ceiling
