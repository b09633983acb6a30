"""Property tests for operators.analytics.segmented_ntile — the
banded two-level exact rank must reproduce ``F.ntile`` (one global
window) integer-for-integer on every distribution shape that stresses
a band design: heavy ties (one value dominating), n < k, n % k != 0,
descending order, negative values, and band-count corners (1 band,
more bands than rows)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from target_hdfs_spark.operators.analytics import segmented_ntile


def _reference(spark, rows, k, descending):
    df = spark.createDataFrame(rows, "v long, u long")
    vord = F.col("v").desc() if descending else F.col("v").asc()
    return {
        (r["u"],): r["tile"]
        for r in df.select(
            "u",
            F.ntile(k)
            .over(Window.orderBy(vord, F.col("u").asc()))
            .cast("long")
            .alias("tile"),
        ).collect()
    }


def _segmented(spark, rows, k, descending, **kw):
    df = spark.createDataFrame(rows, "v long, u long")
    out = segmented_ntile(
        df, k, "v", "tile", tie_col="u", descending=descending, **kw
    )
    got = out.collect()
    assert sorted(got[0].asDict()) == ["tile", "u", "v"]  # helpers dropped
    return {(r["u"],): r["tile"] for r in got}


CASES = [
    # (n_rows, k, descending, value_gen, label)
    (137, 5, False, lambda rng: rng.randrange(0, 1_000_000), "uniform"),
    (137, 5, True, lambda rng: rng.randrange(0, 1_000_000), "uniform desc"),
    (200, 7, False, lambda rng: 1 if rng.random() < 0.8 else rng.randrange(5), "80% tied"),
    (64, 10, True, lambda rng: 0, "all tied"),
    (3, 10, False, lambda rng: rng.randrange(10), "n < k"),
    (1, 4, True, lambda rng: 42, "single row"),
    (100, 4, False, lambda rng: rng.randrange(-500, 500), "negatives"),
    (150, 5, True, lambda rng: rng.choice([0, 10**12]), "bimodal far"),
]


@pytest.mark.parametrize("n,k,desc,gen,label", CASES, ids=[c[4] for c in CASES])
def test_matches_global_ntile(spark, n, k, desc, gen, label):
    rng = random.Random(hash(label) & 0xFFFF)
    rows = [(gen(rng), u) for u in rng.sample(range(10 * n + 1), n)]
    assert _segmented(spark, rows, k, desc) == _reference(spark, rows, k, desc)


@pytest.mark.parametrize("nv,nt", [(1, 1), (3, 2), (256, 256)])
def test_band_count_corners(spark, nv, nt):
    """1 band (everything in one bucket), tiny bands, and more bands
    than rows must all reduce to the same exact ranks."""
    rng = random.Random(7)
    rows = [(rng.randrange(5), u) for u in range(60)]
    assert _segmented(
        spark, rows, 5, False, n_vbands=nv, n_tbands=nt
    ) == _reference(spark, rows, 5, False)


def test_passthrough_columns_survive(spark):
    df = spark.range(20).select(
        F.col("id").alias("u"),
        (F.col("id") % 3).alias("v"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )
    out = segmented_ntile(df, 4, "v", "q", tie_col="u")
    assert set(out.columns) == {"u", "v", "payload", "q"}
    assert out.filter(F.col("payload").isNull()).count() == 0


def test_null_keys_fail_loudly(spark):
    """banded_cumsum must REFUSE null value/tie keys (they would
    silently mis-rank) — prevent, don't advise."""
    import pytest

    from target_hdfs_spark.operators.prefix import banded_cumsum

    df = spark.createDataFrame([(1, 10), (None, 20), (3, 30)], "v long, u long")
    out = banded_cumsum(df, F.lit(1), "v", "r", tie_col="u")
    with pytest.raises(Exception, match="banded_cumsum"):
        out.collect()


def test_string_tie_key_survives_cjk_and_orders_correctly(spark):
    """Regression (round-11 review): the two-code-point string tie
    key is 64-bit — a CJK/emoji-initial token (codepoint >= 1928)
    must neither overflow under ANSI mode nor mis-order tied rows."""
    from target_hdfs_spark.operators.prefix import banded_cumsum

    toks = ["alpha", "beta", "好的", "好吧", "😀x", "zeta", ""]
    df = spark.createDataFrame(
        [(t, 1) for t in toks], "tok string, c long"
    ).filter(F.col("tok") != "")
    tie_key = F.ascii("tok").cast("long") * F.lit(0x110000) + F.ascii(
        F.substring("tok", 2, 1)
    ).cast("long")
    out = banded_cumsum(
        df, F.lit(1), "c", "rnk", tie_col="tok", tie_key=tie_key
    ).collect()
    got = {r["tok"]: r["rnk"] for r in out}
    expected = {t: i + 1 for i, t in enumerate(sorted(t for t in toks if t))}
    assert got == expected
