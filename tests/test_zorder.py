"""Z-order layout test: after a Morton-ordered write, per-file min/max
ranges must be narrow for BOTH sort dimensions (the property parquet
data skipping exploits), unlike a single-column sort where the second
dimension spans the full range in every file."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from target_hdfs_spark.plans.zorder import write_zordered


def _avg_range_fraction(files: list[str], col: str) -> float:
    """Mean (per-file max-min) / (global max-min) for a column."""
    spans, glo, ghi = [], None, None
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = [meta.schema.column(i).name for i in range(meta.num_columns)].index(col)
        lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
        spans.append((lo, hi))
        glo = lo if glo is None else min(glo, lo)
        ghi = hi if ghi is None else max(ghi, hi)
    total = float(ghi - glo) or 1.0
    return sum((hi - lo) / total for lo, hi in spans) / len(spans)


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    # two independent uniform keys: a plain sort on x leaves y's
    # per-file range at ~100%; z-order keeps both well below
    df = spark.range(40_000).selectExpr(
        "cast(id % 200 as long) AS x",
        "cast(pmod(id * 7919, 200) as long) AS y",
        "id AS payload",
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, "x", "y", n_files=8)
    zfiles = sorted(glob.glob(f"{zpath}/*.parquet"))
    assert len(zfiles) >= 4

    spath = str(tmp_path / "xsorted")
    df.orderBy("x").write.mode("overwrite").parquet(spath)
    sfiles = sorted(glob.glob(f"{spath}/*.parquet"))

    zx = _avg_range_fraction(zfiles, "x")
    zy = _avg_range_fraction(zfiles, "y")
    sy = _avg_range_fraction(sfiles, "y") if len(sfiles) > 1 else 1.0

    # both dimensions skippable under z-order...
    assert zx < 0.7 and zy < 0.7, (zx, zy)
    # ...while the plain x-sort leaves y unprunable
    assert sy > 0.9 or len(sfiles) == 1

    # and the data itself is intact
    got = spark.read.parquet(zpath)
    assert got.count() == 40_000
    assert got.agg({"payload": "sum"}).collect()[0][0] == sum(range(40_000))
