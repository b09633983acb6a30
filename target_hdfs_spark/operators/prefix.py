"""Distributed prefix-sum kernel over an arbitrary total order — the
shared scale-safe replacement for ``SUM(w) OVER (ORDER BY ...)`` /
``ROW_NUMBER() OVER (ORDER BY ...)`` single-task global windows.

A global ordered window funnels its whole input through ONE task —
the classic Spark scale trap (at 1e9 rows that's tens of GB through a
single straggler). ``banded_cumsum`` computes the identical integers /
decimals with bounded parallel stages (the packing.py two-pass scan
generalized to arbitrary sort keys):

- one 1-row stats aggregate (min/max of the value and tie keys) is
  broadcast;
- every row maps MAP-SIDE into a fixed-width VALUE band (monotone in
  the sort direction) and, inside a tied value run, a fixed-width
  TIEBREAK sub-band — the composite (value, tband) is monotone in the
  total order (value dir, tie), because the tie key only
  discriminates within equal values;
- per-(vband, value, tband) weight sums aggregate map-side;
- a window PARTITIONED BY vband cumulates that distinct-key frame
  (no tie skew by construction — each key appears once);
- the |vbands|-row band-total cumulative (the only unpartitioned
  window; bounded, metadata scale) is broadcast back;
- a running sum PARTITIONED BY (value, tband) orders the tied-run
  remainder, and the three terms add up to the exact inclusive
  cumulative.

Heavy ties (e.g. 3e8 users sharing frequency=1) split across
``n_tbands`` tasks instead of one; a skewed value distribution
degrades band balance but never correctness. Band counts grow with
the cluster — the math never changes.

Cites reference behavior: none (beyond-reference kernel; the
reference has no query surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PFX_VBANDS = 64
_PFX_TBANDS = 64


def banded_cumsum(
    df: DataFrame,
    weight: Column,
    value_col: str,
    out_col: str,
    *,
    tie_col: str,
    descending: bool = False,
    total_col: str | None = None,
    tie_key: Column | None = None,
    n_vbands: int = _PFX_VBANDS,
    n_tbands: int = _PFX_TBANDS,
) -> DataFrame:
    """Add ``out_col`` = INCLUSIVE running sum of ``weight`` over
    ``ORDER BY value_col [DESC], tie_col`` — exactly the SQL window's
    numbers, never its single task. Optionally attach ``total_col`` =
    the whole-frame weight sum (read off the band-total frame — no
    extra pass over the data).

    ``value_col`` must cast to BIGINT monotonically (integers,
    decimals — CAST truncation is non-decreasing); ``tie_col`` must be
    non-null and row-unique (it completes the total order). A
    non-integral tie column needs ``tie_key``: any BIGINT-castable
    expression MONOTONE in the tie column's sort order (e.g.
    ``F.ascii(col)`` for binary-collated strings) — it only routes
    tied rows into sub-bands; order inside a sub-band still uses the
    tie column itself. ``weight`` must be non-null on every row (a
    null would silently vanish from the sums — pass
    ``F.coalesce(w, F.lit(0))`` if the source can hold nulls). All
    other input columns ride through unchanged.

    The input is consumed three times (stats, band counts, join-back);
    callers with a non-trivial upstream plan should lazy-checkpoint it
    first.
    """
    tk = (tie_key if tie_key is not None else F.col(tie_col)).cast("long")
    # prevent, don't advise: a NULL value or tie key would silently
    # mis-rank (SQL windows sort NULLs to an end; the band arithmetic
    # would route them to a wrong bucket). assert_true rides the
    # existing corpus pass as a filter (NULL when it passes, throws
    # when it fails — a filter cannot be pruned away), so a null key
    # fails the job loudly instead of producing plausible wrong ranks.
    valid = F.col(value_col).isNotNull() & tk.isNotNull()
    keyed = df.where(
        F.assert_true(
            valid,
            F.lit(
                f"banded_cumsum: NULL {value_col}/{tie_col} key — the"
                " total order requires non-null keys; filter or"
                " coalesce them upstream"
            ),
        ).isNull()
    ).withColumn("__tkey", tk)
    stats = keyed.agg(
        F.expr(f"min(CAST({value_col} AS BIGINT))").alias("__vmin"),
        F.expr(f"max(CAST({value_col} AS BIGINT))").alias("__vmax"),
        F.min("__tkey").alias("__tmin"),
        F.max("__tkey").alias("__tmax"),
    )
    delta = (
        f"(CAST({value_col} AS BIGINT) - __vmin)"
        if not descending
        else f"(__vmax - CAST({value_col} AS BIGINT))"
    )
    b = (
        keyed.crossJoin(F.broadcast(stats))
        .withColumn(
            "__vband",
            F.expr(f"{delta} div ((__vmax - __vmin) div {n_vbands} + 1)"),
        )
        .withColumn(
            "__tband",
            F.expr(
                f"(__tkey - __tmin)"
                f" div ((__tmax - __tmin) div {n_tbands} + 1)"
            ),
        )
        .drop("__vmin", "__vmax", "__tmin", "__tmax", "__tkey")
    )
    vord = F.col(value_col).desc() if descending else F.col(value_col).asc()
    g = b.groupBy("__vband", value_col, "__tband").agg(
        F.sum(weight).alias("__gw")
    )
    w_in = (
        Window.partitionBy("__vband")
        .orderBy(vord, F.col("__tband").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("__cumin", F.sum("__gw").over(w_in))
    btot = g.groupBy("__vband").agg(F.sum("__gw").alias("__bn"))
    # the ONLY unpartitioned window: the n_vbands-row band-total frame
    w_off = Window.orderBy("__vband").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    boff = btot.select(
        "__vband",
        F.sum("__bn").over(w_off).alias("__boff"),
        F.sum("__bn").over(w_all).alias("__total"),
    )
    zero = F.lit(0)
    goff = g.join(F.broadcast(boff), "__vband").select(
        value_col,
        "__tband",
        (
            F.coalesce(F.col("__boff"), zero)
            + F.coalesce(F.col("__cumin"), zero)
        ).alias("__goff"),
        "__total",
    )
    w_run = (
        Window.partitionBy(value_col, "__tband")
        .orderBy(F.col(tie_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        b.join(goff, [value_col, "__tband"])
        .withColumn(
            out_col, (F.col("__goff") + F.sum(weight).over(w_run))
        )
        .drop("__vband", "__tband", "__goff")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__total"))
    return out.drop("__total")
