"""Seeded query fuzzer: random filter/aggregation trees are compiled
from ONE AST into both a Spark DataFrame plan and DuckDB SQL, then
compared exactly — a miniature sqllogictest that covers expression
corners no hand-written registry query exercises.

Deterministic (seeded RNG) so failures reproduce; each case embeds
its seed in the assertion message.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from target_hdfs_spark.functions.decimals import dec, to_double
from target_hdfs_spark.sources.readers import load_table
from tests.oracle_compare import _norm_cell

SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def _rand_pred(rng: random.Random, depth: int = 0):
    """Returns (spark_col_fn, sql_str). spark_col_fn: df -> Column."""
    kind = rng.random()
    if depth < 2 and kind < 0.35:
        (la, lsql) = _rand_pred(rng, depth + 1)
        (ra, rsql) = _rand_pred(rng, depth + 1)
        op = rng.choice(["AND", "OR"])
        if op == "AND":
            return (lambda df: la(df) & ra(df), f"({lsql} AND {rsql})")
        return (lambda df: la(df) | ra(df), f"({lsql} OR {rsql})")
    if depth < 2 and kind < 0.45:
        (ia, isql) = _rand_pred(rng, depth + 1)
        return (lambda df: ~ia(df), f"(NOT {isql})")
    choice = rng.random()
    if choice < 0.4:
        col = rng.choice(NUM_COLS)
        thr = round(rng.uniform(0, 50 if col == "l_quantity" else 1), 2)
        if col == "l_extendedprice":
            thr = round(rng.uniform(1000, 90000), 2)
        op = rng.choice(["<", "<=", ">", ">=", "="])
        ops = {"<": "__lt__", "<=": "__le__", ">": "__gt__", ">=": "__ge__", "=": "__eq__"}
        return (
            lambda df, c=col, o=ops[op], t=thr: getattr(F.col(c), o)(F.lit(t)),
            f"{col} {op} {thr}",
        )
    if choice < 0.7:
        col = rng.choice(INT_COLS)
        lo = rng.randint(0, 3000)
        hi = lo + rng.randint(0, 3000)
        return (
            lambda df, c=col, a=lo, b=hi: F.col(c).between(a, b),
            f"{col} BETWEEN {lo} AND {hi}",
        )
    col = rng.choice(STR_COLS)
    vals = rng.sample(["A", "N", "R", "F", "O"], k=rng.randint(1, 3))
    vlist = ", ".join(f"'{v}'" for v in vals)
    return (
        lambda df, c=col, vs=tuple(vals): F.col(c).isin(list(vs)),
        f"{col} IN ({vlist})",
    )


AGGS = [
    # (spark_fn, sql_template) — decimal-exact by convention
    (lambda c: to_double(F.sum(dec(c))),
     "CAST(CAST(SUM(CAST({c} AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)"),
    (lambda c: F.min(F.col(c)), "MIN({c})"),
    (lambda c: F.max(F.col(c)), "MAX({c})"),
    (lambda c: F.count(F.col(c)), "COUNT({c})"),
    (lambda c: F.count_distinct(F.col(c)), "COUNT(DISTINCT {c})"),
]


@pytest.mark.parametrize("seed", range(40))
def test_fuzzed_filter_aggregate(spark, seed):
    rng = random.Random(1_000_003 * (seed + 1))
    pred_fn, pred_sql = _rand_pred(rng)
    group_col = rng.choice(STR_COLS + [None])
    agg_col = rng.choice(NUM_COLS + INT_COLS)
    agg_fn, agg_sql = rng.choice(AGGS)

    li = load_table(spark, SF_DIR, "lineitem")
    sdf = li.filter(pred_fn(li))
    if group_col:
        sdf = sdf.groupBy(group_col).agg(agg_fn(agg_col).alias("m"))
    else:
        sdf = sdf.agg(agg_fn(agg_col).alias("m"))

    sql = (
        f"SELECT {group_col + ', ' if group_col else ''}"
        f"{agg_sql.format(c=agg_col)} AS m "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
        f"WHERE {pred_sql}"
        + (f" GROUP BY {group_col}" if group_col else "")
    )
    con = duckdb.connect()
    drows = con.execute(sql).fetchall()
    srows = [tuple(r) for r in sdf.collect()]

    # global aggregates: Spark's agg() always returns one row, SQL
    # returns one row too (empty input -> nulls/0) — normalize both
    s_norm = sorted(tuple(_norm_cell(v) for v in r) for r in srows)
    d_norm = sorted(tuple(_norm_cell(v) for v in r) for r in drows)
    assert s_norm == d_norm, (
        f"seed={seed} pred=[{pred_sql}] group={group_col} "
        f"agg={agg_sql.format(c=agg_col)}\nspark={s_norm[:3]}\nduck={d_norm[:3]}"
    )


JOIN_AGG_COLS = ["l_quantity", "l_extendedprice", "o_totalprice"]
JOIN_GROUP_COLS = ["l_returnflag", "o_orderstatus", "o_orderpriority", None]


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_join_aggregate(spark, seed):
    """Join fuzz: random lineitem|><|orders predicates + aggregates,
    one AST -> both engines."""
    rng = random.Random(7_777_777 * (seed + 3))
    pred_fn, pred_sql = _rand_pred(rng)
    group_col = rng.choice(JOIN_GROUP_COLS)
    agg_col = rng.choice(JOIN_AGG_COLS)
    agg_fn, agg_sql = rng.choice(AGGS)
    how = rng.choice(["inner", "left_semi"])

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    if how == "inner":
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        from_sql = (
            f"read_parquet('{SF_DIR}/lineitem.parquet') l "
            f"JOIN read_parquet('{SF_DIR}/orders.parquet') o "
            f"ON l.l_orderkey = o.o_orderkey"
        )
    else:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        from_sql = (
            f"read_parquet('{SF_DIR}/lineitem.parquet') l "
            f"WHERE EXISTS (SELECT 1 FROM read_parquet('{SF_DIR}/orders.parquet') o "
            f"WHERE o.o_orderkey = l.l_orderkey)"
        )
        if group_col and group_col.startswith("o_"):
            group_col = "l_returnflag"
        if agg_col.startswith("o_"):
            agg_col = "l_quantity"

    sdf = joined.filter(pred_fn(joined))
    sdf = (
        sdf.groupBy(group_col).agg(agg_fn(agg_col).alias("m"))
        if group_col
        else sdf.agg(agg_fn(agg_col).alias("m"))
    )
    where_kw = "AND" if how == "left_semi" else "WHERE"
    sql = (
        f"SELECT {group_col + ', ' if group_col else ''}"
        f"{agg_sql.format(c=agg_col)} AS m FROM {from_sql} "
        f"{where_kw} {pred_sql}"
        + (f" GROUP BY {group_col}" if group_col else "")
    )
    con = duckdb.connect()
    d = sorted(tuple(_norm_cell(v) for v in r) for r in con.execute(sql).fetchall())
    s = sorted(tuple(_norm_cell(v) for v in r) for r in sdf.collect())
    assert s == d, f"seed={seed} how={how} pred=[{pred_sql}] group={group_col}"


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_window(spark, seed):
    """Window fuzz: random ranking / offset / running-sum windows over
    a random filtered lineitem, one AST -> both engines. Order keys
    always end in (l_orderkey, l_linenumber) so every ordering is
    total — without that, row_number/lag are partition-order lottery.
    """
    from pyspark.sql.window import Window

    rng = random.Random(31_337 * (seed + 11))
    pred_fn, pred_sql = _rand_pred(rng)
    part_col = rng.choice(STR_COLS)
    order_col = rng.choice(INT_COLS + NUM_COLS)
    over_sql = (
        f"PARTITION BY {part_col} "
        f"ORDER BY {order_col}, l_orderkey, l_linenumber"
    )
    w = Window.partitionBy(part_col).orderBy(order_col, "l_orderkey", "l_linenumber")
    kind = rng.choice(["row_number", "rank", "dense_rank", "lag", "lead", "cumsum"])
    if kind == "row_number":
        sc, ssql = F.row_number().over(w), f"row_number() OVER ({over_sql})"
    elif kind == "rank":
        sc, ssql = F.rank().over(w), f"rank() OVER ({over_sql})"
    elif kind == "dense_rank":
        sc, ssql = F.dense_rank().over(w), f"dense_rank() OVER ({over_sql})"
    elif kind == "lag":
        sc = F.lag(order_col, 1).over(w)
        ssql = f"lag({order_col}, 1) OVER ({over_sql})"
    elif kind == "lead":
        sc = F.lead(order_col, 1).over(w)
        ssql = f"lead({order_col}, 1) OVER ({over_sql})"
    else:
        wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        sc = to_double(F.sum(dec(order_col)).over(wf))
        ssql = (
            f"CAST(CAST(SUM(CAST({order_col} AS DECIMAL(12,4))) "
            f"OVER ({over_sql} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"AS VARCHAR) AS DOUBLE)"
        )

    li = load_table(spark, SF_DIR, "lineitem")
    sdf = (
        li.filter(pred_fn(li))
        .select(part_col, "l_orderkey", "l_linenumber", sc.alias("wv"))
    )
    sql = (
        f"SELECT {part_col}, l_orderkey, l_linenumber, {ssql} AS wv "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
        f"WHERE {pred_sql}"
    )
    con = duckdb.connect()
    d = sorted(tuple(_norm_cell(v) for v in r) for r in con.execute(sql).fetchall())
    s = sorted(tuple(_norm_cell(v) for v in r) for r in sdf.collect())
    assert s == d, f"seed={seed} kind={kind} part={part_col} order={order_col} pred=[{pred_sql}]"


@pytest.mark.parametrize("seed", range(15))
def test_fuzzed_set_ops(spark, seed):
    """Set-op fuzz: two random filtered projections combined with a
    random bag/set operator, one AST -> both engines (E16 surface:
    UNION ALL / INTERSECT [ALL] / EXCEPT [ALL])."""
    rng = random.Random(4_242_43 * (seed + 5))
    p1, s1 = _rand_pred(rng)
    p2, s2 = _rand_pred(rng)
    cols = rng.sample(STR_COLS + INT_COLS, k=rng.randint(2, 3))
    collist = ", ".join(cols)
    op = rng.choice(["union_all", "intersect", "intersect_all", "except", "except_all"])

    li = load_table(spark, SF_DIR, "lineitem")
    a = li.filter(p1(li)).select(*cols)
    b = li.filter(p2(li)).select(*cols)
    if op == "union_all":
        sdf, sql_op = a.unionAll(b), "UNION ALL"
    elif op == "intersect":
        sdf, sql_op = a.intersect(b), "INTERSECT"
    elif op == "intersect_all":
        sdf, sql_op = a.intersectAll(b), "INTERSECT ALL"
    elif op == "except":
        sdf, sql_op = a.subtract(b), "EXCEPT"
    else:
        sdf, sql_op = a.exceptAll(b), "EXCEPT ALL"

    src = f"read_parquet('{SF_DIR}/lineitem.parquet')"
    sql = (
        f"SELECT {collist} FROM {src} WHERE {s1} "
        f"{sql_op} "
        f"SELECT {collist} FROM {src} WHERE {s2}"
    )
    con = duckdb.connect()
    d = sorted(tuple(_norm_cell(v) for v in r) for r in con.execute(sql).fetchall())
    s = sorted(tuple(_norm_cell(v) for v in r) for r in sdf.collect())
    assert s == d, f"seed={seed} op={op} cols={cols}\np1=[{s1}]\np2=[{s2}]"


GS_GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


@pytest.mark.parametrize("seed", range(15))
def test_fuzzed_grouping_sets(spark, seed):
    """Multi-dimensional aggregation fuzz (E11 surface): random
    rollup / cube / explicit GROUPING SETS over low-cardinality
    columns with a random aggregate and predicate, one AST -> both
    engines. Subtotal rows carry NULL group keys on both sides; the
    group columns themselves are non-null in lineitem, so the NULLs
    are unambiguous."""
    rng = random.Random(9_090_91 * (seed + 7))
    k = rng.randint(2, 3)
    gcols = rng.sample(GS_GROUP_COLS, k=k)
    collist = ", ".join(gcols)
    agg_col = rng.choice(NUM_COLS)
    agg_fn, agg_sql = rng.choice(AGGS)
    mode = rng.choice(["rollup", "cube", "sets"])

    li = load_table(spark, SF_DIR, "lineitem")
    # Pinned cross-engine divergence: over EMPTY input, DuckDB (per
    # SQL standard) still emits the () grand-total grouping set as one
    # all-NULL row, while Spark's cube/rollup emit no rows. Registry
    # queries avoid the corner (non-empty inputs); the fuzzer redraws
    # predicates until the input is non-empty (deterministically —
    # same rng stream).
    for _ in range(10):
        pred_fn, pred_sql = _rand_pred(rng)
        filtered = li.filter(pred_fn(li))
        if filtered.limit(1).count() > 0:
            break
    else:
        pytest.skip("no non-empty predicate drawn in 10 tries")
    if mode == "rollup":
        sdf = filtered.rollup(*gcols).agg(agg_fn(agg_col).alias("m"))
        group_sql = f"ROLLUP ({collist})"
    elif mode == "cube":
        sdf = filtered.cube(*gcols).agg(agg_fn(agg_col).alias("m"))
        group_sql = f"CUBE ({collist})"
    else:
        # random non-empty subset family of the group columns; the
        # select list must be covered by the union of the sets (Spark
        # enforces this; MISSING_AGGREGATION otherwise)
        n_sets = rng.randint(2, 3)
        sets = [
            rng.sample(gcols, k=rng.randint(1, len(gcols)))
            for _ in range(n_sets)
        ]
        covered = {c for s in sets for c in s}
        missing = [c for c in gcols if c not in covered]
        if missing:
            sets.append(missing)
        sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
        group_sql = f"GROUPING SETS ({sets_sql})"
        view = f"fuzz_gs_{seed}"
        filtered.createOrReplaceTempView(view)
        agg_spark_sql = agg_sql.format(c=agg_col).replace("VARCHAR", "STRING")
        sdf = spark.sql(
            f"SELECT {collist}, {agg_spark_sql} AS m FROM {view} "
            f"GROUP BY {group_sql}"
        )

    sql = (
        f"SELECT {collist}, {agg_sql.format(c=agg_col)} AS m "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
        f"WHERE {pred_sql} GROUP BY {group_sql}"
    )
    con = duckdb.connect()
    d = sorted(tuple(_norm_cell(v) for v in r) for r in con.execute(sql).fetchall())
    s = sorted(tuple(_norm_cell(v) for v in r) for r in sdf.collect())
    assert s == d, (
        f"seed={seed} mode={mode} group=[{group_sql}] "
        f"agg={agg_sql.format(c=agg_col)} pred=[{pred_sql}]"
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_regression_moments(spark, seed):
    """Grouped-OLS moment pipeline fuzz (q136's core): random
    predicate, group key, and (x, y) column pair; the five decimal
    moment sums + count must match DuckDB bit-for-bit, including
    empty groups and degenerate (x == y) pairs. DECIMAL(19,4) on the
    oracle's products forces int128 (the q136 overflow fix) — this
    fuzz pins that across arbitrary column pairs."""
    rng = random.Random(7_000_033 * (seed + 1))
    pred_fn, pred_sql = _rand_pred(rng)
    group_col = rng.choice(STR_COLS + [None])
    x = rng.choice(NUM_COLS)
    y = rng.choice(NUM_COLS)  # may equal x: sxx == sxy == syy corner

    li = load_table(spark, SF_DIR, "lineitem")
    base = li.filter(pred_fn(li))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        to_double(F.sum(dec(x))).alias("sx"),
        to_double(F.sum(dec(y))).alias("sy"),
        to_double(F.sum(dec(x) * dec(y))).alias("sxy"),
        to_double(F.sum(dec(x) * dec(x))).alias("sxx"),
        to_double(F.sum(dec(y) * dec(y))).alias("syy"),
    ]
    sdf = base.groupBy(group_col).agg(*aggs) if group_col else base.agg(*aggs)

    def d19(c):
        return f"CAST({c} AS DECIMAL(19,4))"

    def s2d(expr):
        return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"

    sql = (
        f"SELECT {group_col + ', ' if group_col else ''}"
        f"COUNT(*) AS n, "
        f"{s2d(f'SUM(CAST({x} AS DECIMAL(12,4)))')} AS sx, "
        f"{s2d(f'SUM(CAST({y} AS DECIMAL(12,4)))')} AS sy, "
        f"{s2d(f'SUM({d19(x)} * {d19(y)})')} AS sxy, "
        f"{s2d(f'SUM({d19(x)} * {d19(x)})')} AS sxx, "
        f"{s2d(f'SUM({d19(y)} * {d19(y)})')} AS syy "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') "
        f"WHERE {pred_sql}"
        + (f" GROUP BY {group_col}" if group_col else "")
    )
    con = duckdb.connect()
    drows = con.execute(sql).fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    s_norm = sorted(tuple(_norm_cell(v) for v in r) for r in srows)
    d_norm = sorted(tuple(_norm_cell(v) for v in r) for r in drows)
    assert s_norm == d_norm, (
        f"seed={seed} pred=[{pred_sql}] group={group_col} x={x} y={y}\n"
        f"spark={s_norm[:2]}\nduck={d_norm[:2]}"
    )


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_cdc_last_writer_wins(spark, seed):
    """q143's window rule vs a brute-force Python fold over random
    change logs — including exact (ts) ties broken by event_id and
    delete-then-older-upsert orderings."""
    import datetime as dt

    from target_hdfs_spark.operators.curation import (
        q143_cdc_last_writer_wins,  # noqa: F401  (rule reference)
    )
    from target_hdfs_spark.streaming.cdc import classify_ops, latest_per_key

    rng = random.Random(9_000_077 * (seed + 1))
    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(120):
        rows.append(
            (
                rng.randrange(8),                                  # user_id
                eid,
                base + dt.timedelta(seconds=rng.randrange(50)),    # many ts ties
                float(rng.randrange(1000)) / 4.0,
                rng.choice(["view", "click", "error", "purchase"]),
            )
        )
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double, event_type string"
    )
    got = {
        (r.user_id, r.value)
        for r in latest_per_key(classify_ops(df))
        .filter(F.col("op") == "upsert")
        .collect()
    }
    # brute force: sort by (ts, event_id), last op wins
    final: dict[int, tuple] = {}
    for u, eid, ts, v, et in sorted(rows, key=lambda r: (r[2], r[1])):
        final[u] = ("delete" if et == "error" else "upsert", v)
    expected = {(u, v) for u, (op, v) in final.items() if op == "upsert"}
    assert got == expected, f"seed={seed}"
