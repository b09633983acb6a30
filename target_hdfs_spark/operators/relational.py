"""Core relational operators (SURVEY.md §2B.1, E1-E24).

Each query is a declarative DataFrame plan — Catalyst gets predicate
pushdown, column pruning, broadcast selection and AQE re-planning for
free. Design notes for 100 TB are in each docstring.

Determinism conventions (shared with the DuckDB oracles):
- aggregate arithmetic in exact DECIMAL, cast to double last
  (functions/decimals.py);
- every window/order has a total ordering (unique-key tiebreakers);
- result column aliases are lowercase and identical on both sides.

Reference parity: the reference engine has **no** query surface at all
(SURVEY.md §2A — verified by exhaustion of its 274 source lines), so
everything here is the mandated extension surface; the reference files
cited in sources/ and plans/ cover the ingest behaviors.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from target_hdfs_spark.functions.decimals import davg, dec, dsum, to_double
from target_hdfs_spark.functions.textfuncs import TOKENS_SQL
from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table

_DOC_TOK = TOKENS_SQL.format(expr="text")

# ---------------------------------------------------------------------------
# E1 scan + E3 filter + E9 hash agg + E15 sort — the flagship (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
               * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("scan", "filter", "agg", "sort"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): filtered scan ->
    hash aggregate -> sort.

    Scale: the filter and the two grouping columns reach the parquet
    scan (PushedFilters + 7-column ReadSchema on a 16-column table);
    partial aggregation combines map-side, so the shuffle carries only
    6 groups x partitions rows regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    tax = F.lit(1).cast("decimal(12,4)") + dec("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            to_double(F.sum(dec("l_extendedprice") * disc)).alias("sum_disc_price"),
            to_double(F.sum(dec("l_extendedprice") * disc * tax)).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# E2 projection / computed columns + E3 predicates
# ---------------------------------------------------------------------------


@query(
    "q02_filter_project",
    oracle="""
    SELECT
      p_partkey,
      lower(p_name) AS name_lc,
      p_retailprice,
      CASE WHEN p_size < 17 THEN 'small'
           WHEN p_size < 34 THEN 'medium'
           ELSE 'large' END AS size_band,
      p_size * 2 AS double_size
    FROM part
    WHERE p_size BETWEEN 5 AND 45 AND p_brand LIKE 'Brand#1%'
    """,
    tags=("project", "filter"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns over a predicated scan.

    Scale: both predicates push to parquet (min/max row-group skipping);
    only 5 of 6 columns are read.
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(5, 45) & F.col("p_brand").like("Brand#1%")
    ).select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        "p_retailprice",
        F.when(F.col("p_size") < 17, "small")
        .when(F.col("p_size") < 34, "medium")
        .otherwise("large")
        .alias("size_band"),
        (F.col("p_size") * F.lit(2)).alias("double_size"),
    )


# ---------------------------------------------------------------------------
# E4 equi-joins + E5 broadcast — multiway star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------


@query(
    "q03_local_supplier_revenue",
    oracle="""
    SELECT
      r_name,
      n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    tags=("join", "broadcast", "agg"),
)
def q03_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by region/nation (TPC-H Q5 shape):
    fact-fact shuffle joins plus broadcast dimension joins.

    Scale: lineitem|><|orders|><|customer are the big shuffles (AQE
    handles skew); supplier/nation/region are broadcast so the star
    lookups never shuffle the fact table again. The o_orderdate window
    pushes down to the orders scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    disc = F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            to_double(F.sum(dec("l_extendedprice") * disc)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# E6 semi / anti joins
# ---------------------------------------------------------------------------


@query(
    "q04_semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("join", "semi"),
)
def q04_semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one urgent order (left-semi join).

    Scale: semi join never duplicates the probe side and the priority
    filter pushes into the orders scan; with AQE the filtered build
    side is broadcast when small enough.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q05_anti_join_orderless_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("join", "anti"),
)
def q05_anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that never placed an urgent order (left-anti join;
    the priority filter keeps the result non-degenerate on this data —
    every customer has *some* order)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# E7 theta / range join
# ---------------------------------------------------------------------------


@query(
    "q06_range_join_size_bands",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM part p
    JOIN (VALUES ('small', 1, 16), ('medium', 17, 33), ('large', 34, 200))
         AS b(band, lo, hi)
      ON p.p_size >= b.lo AND p.p_size <= b.hi
    GROUP BY b.band
    """,
    tags=("join", "range"),
)
def q06_range_join_size_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts banded by inclusive size intervals.

    Scale: the band table is tiny and broadcast, so the non-equi
    condition is evaluated as a broadcast nested-loop join — the only
    sane physical plan for theta joins; the fact side streams through
    without a shuffle.
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("small", 1, 16), ("medium", 17, 33), ("large", 34, 200)],
        "band string, lo int, hi int",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_size >= bands.lo) & (part.p_size <= bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# E9 full aggregate-function surface (incl. order-independent stddev)
# ---------------------------------------------------------------------------


@query(
    "q07_agg_stats",
    oracle="""
    WITH s AS (
      SELECT
        o_orderpriority,
        COUNT(*) AS n_orders,
        COUNT(DISTINCT o_custkey) AS n_customers,
        MIN(o_totalprice) AS min_price,
        MAX(o_totalprice) AS max_price,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
        -- DECIMAL(19,4) forces DuckDB onto int128 arithmetic; the
        -- scaled square of a 6-digit price overflows its int64 path.
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                 * CAST(o_totalprice AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_sq
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_orders, n_customers, min_price, max_price, sum_price,
           sqrt((sum_sq - sum_price * sum_price / n_orders) / (n_orders - 1)) AS stddev_price
    FROM s
    """,
    tags=("agg",),
)
def q07_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function surface: count / count distinct / min / max /
    sum, plus an order-independent sample stddev built from exact
    decimal sums (floating stddev is not reproducible across engines;
    this formulation is bit-deterministic).

    Scale: count(distinct) triggers Spark's two-phase expand+agg; all
    other aggregates combine map-side.
    """
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dsum("o_totalprice").alias("sum_price"),
        to_double(F.sum(dec("o_totalprice") * dec("o_totalprice"))).alias("sum_sq"),
    )
    n = F.col("n_orders")
    var = (F.col("sum_sq") - F.col("sum_price") * F.col("sum_price") / n) / (n - F.lit(1))
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "n_customers",
        "min_price",
        "max_price",
        "sum_price",
        F.sqrt(var).alias("stddev_price"),
    )


# ---------------------------------------------------------------------------
# E10 distinct
# ---------------------------------------------------------------------------


@query(
    "q08_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    tags=("distinct",),
)
def q08_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct key combinations (hash-based; map-side partial dedup)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


# ---------------------------------------------------------------------------
# E11 rollup / grouping sets
# ---------------------------------------------------------------------------


@query(
    "q09_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (grouping-sets expansion).

    Scale: Spark expands grouping sets before the shuffle (Expand
    node) — 3x the map output here, still combined map-side.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# E13 window ranking (top-k per group)
# ---------------------------------------------------------------------------


@query(
    "q10_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number with a total ordering
    (o_orderkey tiebreaker makes ranking deterministic).

    Scale: one shuffle on the partition key; rank<=k is applied
    stream-side per group (no full sort of the table). Skewed
    customers are the risk — AQE skew handling applies.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# E14 window analytics (lag / lead / running aggregate)
# ---------------------------------------------------------------------------


@query(
    "q11_window_analytic",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate, o_totalprice,
      lag(o_totalprice) OVER w AS prev_price,
      lead(o_totalprice) OVER w AS next_price,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS VARCHAR) AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def q11_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: lag/lead neighbors and an exact
    running spend (decimal cumulative sum -> order-independent of
    physical plan, deterministic given the total ordering)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        to_double(F.sum(dec("o_totalprice")).over(wsum)).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# E15 global sort / limit (top-k)
# ---------------------------------------------------------------------------


@query(
    "q12_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q12_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price with unique tiebreakers (deterministic
    under ties).

    Scale: Spark compiles orderBy+limit into TakeOrderedAndProject —
    a per-partition top-k then a driver merge of k*partitions rows;
    no global sort ever materializes.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E16 set operations
# ---------------------------------------------------------------------------


@query(
    "q13_set_ops",
    oracle="""
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'f_only' AS tag, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
    """,
    tags=("setops",),
)
def q13_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over customer-key sets."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f.intersect(o).withColumn("tag", F.lit("both"))
    f_only = f.subtract(o).withColumn("tag", F.lit("f_only"))
    return both.unionByName(f_only).select("tag", "o_custkey")


# ---------------------------------------------------------------------------
# E17 string functions
# ---------------------------------------------------------------------------


@query(
    "q14_string_funcs",
    oracle="""
    SELECT
      c_custkey,
      upper(c_name) AS name_uc,
      length(c_name) AS name_len,
      substring(c_name, 1, 8) AS name_prefix,
      trim(concat(c_mktsegment, ' ')) AS seg_trim,
      concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
      regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
      replace(c_name, 'Customer', 'Cst') AS name_replaced,
      levenshtein(c_mktsegment, 'BUILDING') AS seg_dist
    FROM customer
    WHERE c_custkey <= 500
    """,
    tags=("scalar", "string"),
)
def q14_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (all JVM built-ins, codegen'd)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_uc"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cst")).alias("name_replaced"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_dist"),
    )


# ---------------------------------------------------------------------------
# E18 date/time functions
# ---------------------------------------------------------------------------


@query(
    "q15_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(month(o_orderdate) AS INT) AS order_month,
      CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
      CAST(o_orderdate AS DATE) AS order_date,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
        AS days_to_y2k
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    tags=("scalar", "datetime"),
)
def q15_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time surface: extraction, truncation, arithmetic."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_y2k"
        ),
    )


# ---------------------------------------------------------------------------
# E19 math / conditional scalar functions
# ---------------------------------------------------------------------------


@query(
    "q16_math_conditional",
    oracle="""
    SELECT
      s_suppkey,
      abs(s_acctbal) AS abs_bal,
      CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
      CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
      round(s_acctbal, 1) AS round_bal,
      sqrt(abs(s_acctbal)) AS sqrt_bal,
      CASE WHEN s_acctbal < 0 THEN 'debt'
           WHEN s_acctbal < 5000 THEN 'ok'
           ELSE 'rich' END AS bal_band,
      coalesce(NULLIF(s_nationkey, 0), -1) AS nation_or_default
    FROM supplier
    """,
    tags=("scalar", "math"),
)
def q16_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional scalar surface. sqrt/abs/ceil/floor are
    IEEE-exact (reproducible); transcendental functions are avoided in
    checkable outputs by design."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.abs(F.col("s_acctbal")).alias("abs_bal"),
        F.ceil("s_acctbal").alias("ceil_bal"),
        F.floor("s_acctbal").alias("floor_bal"),
        F.round(F.col("s_acctbal"), 1).alias("round_bal"),
        F.sqrt(F.abs(F.col("s_acctbal"))).alias("sqrt_bal"),
        F.when(F.col("s_acctbal") < 0, "debt")
        .when(F.col("s_acctbal") < 5000, "ok")
        .otherwise("rich")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)
        ).alias("nation_or_default"),
    )


# ---------------------------------------------------------------------------
# E20 array functions (explode path; vector array ops live in similarity.py)
# ---------------------------------------------------------------------------


@query(
    "q17_array_explode",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split(p_name, ' ')) AS token FROM part
    )
    WHERE token <> ''
    GROUP BY token
    """,
    tags=("array", "explode"),
)
def q17_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split -> explode -> count: the canonical array-to-rows path.

    Scale: explode is pipelined (no shuffle of its own); the count
    aggregates map-side before the single shuffle on token.
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# E21 JSON functions
# ---------------------------------------------------------------------------


@query(
    "q18_json_extract",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("json",),
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract typed values from a JSON string
    column and aggregate (events.props).

    Scale: get_json_object is a JVM built-in evaluated in the scan
    stage; no Python involvement.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# E22 pivot
# ---------------------------------------------------------------------------


@query(
    "q19_pivot",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS status_f,
      COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS status_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("pivot",),
)
def q19_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot line-status counts to columns. Pivot values are declared
    explicitly — at scale, letting Spark discover pivot values costs
    an extra distinct pass over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"]).count()
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
    )


# ---------------------------------------------------------------------------
# E12 approximate aggregates (rows-only check: HLL/quantile sketches are
# engine-specific by construction, so no value oracle exists)
# ---------------------------------------------------------------------------


@query(
    "q20_approx_aggs",
    oracle=None,
    tags=("agg", "approx", "rows-only"),
)
def q20_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates: approx_count_distinct (HyperLogLog++) and
    approx percentiles. Values are sketch-dependent, hence rows-only
    verification; the exact companions in q07 cover correctness.

    Scale: this is the point — HLL and quantile sketches keep the
    shuffle O(sketch size) instead of O(distinct values) at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        # scalar columns, not an array: the driver's pandas-based
        # canonicalizer cannot sort list-valued cells
        F.element_at(pcts, 1).alias("price_p50"),
        F.element_at(pcts, 2).alias("price_p95"),
    )


# ---------------------------------------------------------------------------
# E23 sampling (rows-only: RNG streams are engine-specific)
# ---------------------------------------------------------------------------


@query(
    "q21_sample",
    oracle=None,
    tags=("sample", "rows-only"),
)
def q21_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample of lineitem. Deterministic per Spark
    version/partitioning but not across engines -> rows-only check.

    Scale: sampling is evaluated inside the scan stage (no shuffle,
    no materialization); at 100 TB this is how dev iterations and
    data-quality spot checks stay cheap.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.01, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# ---------------------------------------------------------------------------
# E24 UDF surface: vectorized (Arrow) pandas UDF — the sanctioned slow path
# ---------------------------------------------------------------------------


@query(
    "q22_pandas_udf",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           n_chars
    FROM documents
    """,
    tags=("udf",),
)
def q22_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF (whitespace token count), checked
    against the equivalent SQL. Demonstrates the engine's UDF
    convention: batch-vectorized, never row-at-a-time.

    Scale: Arrow batches amortize the Python boundary; the UDF is a
    map-only operation so it parallelizes embarrassingly.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def n_tokens(text: "pd.Series") -> "pd.Series":
        return text.str.strip().str.split().map(len).astype("int32")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens("text").alias("n_tokens"), "n_chars")


# ---------------------------------------------------------------------------
# E4/E9/E15 composed — TPC-H Q3 shape (join-agg-topk pipeline)
# ---------------------------------------------------------------------------


@query(
    "q23_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q23_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue orders in a segment/date window (TPC-H Q3 shape):
    selective dimension filter -> fact join -> aggregate -> top-k.

    Scale: the segment filter shrinks customer before its join
    (pushed to the scan); orderBy+limit compiles to per-partition
    top-k, never a global sort. Deterministic under ties via the
    (o_orderdate, l_orderkey) tiebreakers.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    disc = F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(to_double(F.sum(dec("l_extendedprice") * disc)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E9 + HAVING — aggregate filter (TPC-H Q18 shape)
# ---------------------------------------------------------------------------


@query(
    "q24_large_volume_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, big.total_qty
    FROM (
      SELECT l_orderkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 150
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    """,
    tags=("agg", "having", "join"),
)
def q24_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (TPC-H Q18
    shape): HAVING via a post-aggregation filter, then a key join back
    to the fact header.

    Scale: the aggregate+filter shrinks the join's build side to the
    few qualifying orders; AQE turns the join into a broadcast at
    runtime.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(dec("l_quantity")).alias("_qty_dec"),
        )
        .filter(F.col("_qty_dec") > 150)
        .select("l_orderkey", to_double(F.col("_qty_dec")).alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    return big.join(orders, big.l_orderkey == orders.o_orderkey).select(
        "o_orderkey", "o_custkey", "total_qty"
    )


# ---------------------------------------------------------------------------
# E3/E9 — scalar-subquery comparison (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


@query(
    "q25_below_average_lineitems",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, l.l_quantity
    FROM lineitem l
    JOIN (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
    tags=("agg", "subquery", "join"),
)
def q25_below_average_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line items below half their part's average quantity (TPC-H Q17
    shape): the correlated scalar subquery expressed as an aggregate
    join — exactly how Catalyst de-correlates it internally, but
    explicit so the plan is predictable.

    Scale: one shuffle for the per-part average (map-side combined),
    one broadcast-or-shuffle join back; never a per-row subquery.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (to_double(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "pa_partkey")
    return (
        li.join(part_avg, li.l_partkey == part_avg.pa_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# ---------------------------------------------------------------------------
# E13/E14 — distribution window functions
# ---------------------------------------------------------------------------


@query(
    "q26_window_distribution",
    oracle="""
    SELECT
      o_orderkey,
      o_orderpriority,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume,
      ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "distribution"),
)
def q26_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over a totally-ordered window.
    All three are rational functions of integer ranks -> exact double
    equality across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# E14 — RANGE frame (value-range windows, not row counts)
# ---------------------------------------------------------------------------


@query(
    "q27_range_frame_spend",
    oracle="""
    SELECT
      o_custkey, o_orderkey, day_n,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
        PARTITION BY o_custkey ORDER BY day_n
        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
      ) AS VARCHAR) AS DOUBLE) AS spend_30d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_n
      FROM orders
    )
    """,
    tags=("window", "range-frame"),
)
def q27_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE frame over a day
    number (value-based, so rows with equal days aggregate together —
    semantically different from a 30-ROW frame).

    Scale: same single shuffle as any partitioned window; the exact
    decimal running sum keeps it oracle-checkable.
    """
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date"))
    base = orders.select(
        "o_custkey", "o_orderkey", "o_totalprice", days.alias("day_n")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_n")
        .rangeBetween(-30, Window.currentRow)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "day_n",
        to_double(F.sum(dec("o_totalprice")).over(w)).alias("spend_30d"),
    )


# ---------------------------------------------------------------------------
# E11 — CUBE and SQL-API grouping sets
# ---------------------------------------------------------------------------


@query(
    "q28_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def q28_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (Expand node
    before the shuffle, k-fold map output — still combined map-side)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "q29_grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("agg", "grouping-sets", "sql-api"),
)
def q29_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the spark.sql entry point — the
    engine's SQL API surface (every DataFrame query here has an
    equivalent through spark.sql; this one exercises that path)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q29_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
        FROM q29_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# E6/E9 — NOT IN as anti join over aggregates (TPC-H Q16 shape)
# ---------------------------------------------------------------------------


@query(
    "q35_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type
    """,
    tags=("join", "anti", "agg"),
)
def q35_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per brand/type excluding blacklisted
    suppliers (TPC-H Q16 shape). NOT IN compiles to a left-anti join —
    note NOT IN's null trap doesn't apply (s_suppkey is a key), which
    is why the anti-join rewrite is semantically safe here.

    Scale: the blacklist is tiny and broadcast; count(distinct)
    expands (brand,type,suppkey) once before the shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# E9/E6 — global-average comparison + anti join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@query(
    "q36_rich_inactive_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    """,
    tags=("agg", "subquery", "anti"),
)
def q36_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent orders (TPC-H
    Q22 shape): a global scalar aggregate broadcast into the filter,
    then an anti join against recent orders.

    Scale: the scalar is a 1-row broadcast cross join (never a
    collect); the anti join's build side is date-filtered at the scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (to_double(F.sum(dec("c_acctbal"))) / F.count(F.lit(1))).alias("a")
        )
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# E9/E13 — per-group minimum selection (TPC-H Q2 shape)
# ---------------------------------------------------------------------------


@query(
    "q37_cheapest_supplier_per_part",
    oracle="""
    SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
    FROM lineitem l
    JOIN (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    ) m ON m.l_partkey = l.l_partkey AND l.l_extendedprice = m.min_price
    QUALIFY row_number() OVER (
      PARTITION BY l.l_partkey ORDER BY l.l_suppkey, l.l_orderkey, l.l_linenumber
    ) = 1
    """,
    tags=("agg", "join", "window"),
)
def q37_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest line item per part (TPC-H Q2's correlated-min shape):
    per-group min via aggregate join-back, with a deterministic
    row_number tiebreak for equal-price ties.

    Scale: the min-aggregate combines map-side; the join-back is an
    equi-join Catalyst can broadcast when the distinct-part count
    allows; no window over the full table (the window runs on the
    already-min-filtered rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    mins = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    mins = mins.withColumnRenamed("l_partkey", "m_partkey")
    w = Window.partitionBy("l_partkey").orderBy(
        "l_suppkey", "l_orderkey", "l_linenumber"
    )
    return (
        li.join(
            mins,
            (li.l_partkey == mins.m_partkey)
            & (li.l_extendedprice == mins.min_price),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# E9 — argmax aggregates + ordered collect
# ---------------------------------------------------------------------------


@query(
    "q38_argmax_aggregates",
    oracle="""
    SELECT c_nationkey,
           max_by(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 10000000
                          + c_custkey) AS richest_customer,
           min_by(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 10000000
                          + c_custkey) AS poorest_customer,
           array_to_string(list_sort(list(c_mktsegment)), '|') AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "argmax", "collect"),
)
def q38_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregates) with an integer-encoded
    (balance, custkey) ordering key — exact for 2-decimal balances and
    a total order, so ties are deterministic (DuckDB's max_by cannot
    compare structs; the encoded key is the portable formulation).
    collect_list is made order-insensitive via sort_array — collect
    order is partition-dependent, so sorting is the only checkable
    formulation.

    Scale: all three are single-pass hash aggregates with map-side
    combine.
    """
    cust = load_table(spark, sf_dir, "customer")
    rank_key = (
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint") * F.lit(10_000_000)
        + F.col("c_custkey")
    )
    return cust.groupBy("c_nationkey").agg(
        F.max_by(F.col("c_name"), rank_key).alias("richest_customer"),
        F.min_by(F.col("c_name"), rank_key).alias("poorest_customer"),
        # pipe-joined (not an array column): driver canonicalizer can't
        # sort list cells; order-insensitivity preserved via sort first
        F.array_join(F.sort_array(F.collect_list("c_mktsegment")), "|").alias("segments"),
    )


# ---------------------------------------------------------------------------
# E19 — null semantics (three-valued logic, null-safe equality)
# ---------------------------------------------------------------------------


@query(
    "q39_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'P') AS status_or_null,
             o_totalprice
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT
      t.o_orderkey,
      t.status_or_null,
      coalesce(t.status_or_null, 'PENDING') AS status_filled,
      (t.status_or_null IS NOT DISTINCT FROM NULL) AS is_pending,
      CASE WHEN t.status_or_null = 'F' THEN 'final'
           WHEN t.status_or_null IS NULL THEN 'pending'
           ELSE 'other' END AS bucket
    FROM t
    """,
    tags=("scalar", "null"),
)
def q39_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: NULLIF-generated nulls, COALESCE
    fill, null-safe equality (Spark `<=>` == SQL IS NOT DISTINCT
    FROM), and CASE branches over null."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    t = orders.select("o_orderkey", status.alias("status_or_null"))
    return t.select(
        "o_orderkey",
        "status_or_null",
        F.coalesce(F.col("status_or_null"), F.lit("PENDING")).alias("status_filled"),
        F.col("status_or_null").eqNullSafe(F.lit(None).cast("string")).alias("is_pending"),
        F.when(F.col("status_or_null") == "F", "final")
        .when(F.col("status_or_null").isNull(), "pending")
        .otherwise("other")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# E6/E18 — semi-join existence count (TPC-H Q4 shape)
# ---------------------------------------------------------------------------


@query(
    "q65_priority_order_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("semi", "agg", "datetime"),
)
def q65_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one late-shipping line item, counted by
    priority (TPC-H Q4 shape): a correlated EXISTS with a cross-table
    predicate -> semi join on key + condition.

    Scale: the semi join never duplicates orders rows; the date window
    pushes to the orders scan.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# E9/E19 — conditional aggregation buckets (TPC-H Q12 shape)
# ---------------------------------------------------------------------------


@query(
    "q66_priority_shipping_buckets",
    oracle="""
    SELECT
      l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT)
        AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT)
        AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("agg", "conditional", "join"),
)
def q66_priority_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-vs-other line counts per line status (TPC-H Q12 shape):
    conditional aggregation — CASE inside SUM — the standard
    one-pass alternative to two filtered scans."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# E9/E19 — ratio-of-conditional-sums metric (TPC-H Q14 shape)
# ---------------------------------------------------------------------------


@query(
    "q67_brand_revenue_share",
    oracle="""
    SELECT
      CAST(CAST(SUM(CASE WHEN p_brand LIKE 'Brand#1%' THEN
            CAST(l_extendedprice AS DECIMAL(12,4))
            * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
          ELSE CAST(0 AS DECIMAL(25,8)) END) AS VARCHAR) AS DOUBLE)
      / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
      * 100 AS brand1_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    tags=("agg", "conditional", "ratio"),
)
def q67_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-family revenue share (TPC-H Q14 shape): a global ratio of
    conditional decimal sums — both numerator and denominator exact,
    one double division at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc_price = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    )
    branded = F.when(
        F.col("p_brand").like("Brand#1%"), disc_price
    ).otherwise(F.lit(0).cast("decimal(25,8)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                to_double(F.sum(branded))
                / to_double(F.sum(disc_price))
                * 100
            ).alias("brand1_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# E3/E4 — disjunctive multi-attribute join predicates (TPC-H Q19 shape)
# ---------------------------------------------------------------------------


@query(
    "q68_disjunctive_predicates",
    oracle="""
    SELECT
      COUNT(*) AS n_items,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
        AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE
      (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 21)
      OR (p_brand = 'Brand#9' AND p_size BETWEEN 10 AND 30
        AND l_quantity BETWEEN 10 AND 40)
      OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
        AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("filter", "disjunction", "join"),
)
def q68_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue over an OR-of-conjunctions predicate spanning both join
    sides (TPC-H Q19 shape) — the classic test of predicate handling:
    Catalyst extracts the common join key, pushes the per-table parts
    of each disjunct into the scans, and evaluates the residual on
    joined rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    disc_price = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_items"),
        to_double(F.sum(disc_price)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# E24 — grouped-map applyInPandas (per-group pandas transformation)
# ---------------------------------------------------------------------------


@query(
    "q72_applyinpandas_minmax_norm",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CASE WHEN mx = mn THEN 0.5
                ELSE (o_totalprice - mn) / (mx - mn) END AS price_norm
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             MIN(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
             MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
      FROM orders
    )
    """,
    tags=("udf", "applyInPandas", "groupby"),
)
def q72_applyinpandas_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer min-max normalization via grouped-map
    applyInPandas — the UDAF-ish member of the UDF surface (scalar
    pandas_udf = q22, mapInPandas = q61/q62, grouped map = here).
    Min/max are order-independent and the normalization is one double
    division, so even the Python-side computation is exact against the
    SQL-window oracle.

    Scale: grouped-map pays a fixed Arrow/pandas roundtrip PER GROUP,
    so grouping directly on a high-cardinality key (one group per
    customer) is the classic anti-pattern — measured 29 s at sf0.1
    versus 2 s for this formulation. The scale-correct shape: group on
    a BOUNDED bucket of the key (here pmod(custkey, 64)) and run a
    vectorized pandas groupby over the real key inside the function.
    Calls drop from n_customers to n_buckets; per-call memory is
    corpus/64 (choose bucket count so each fits an executor); the
    custkey->bucket mapping keeps every customer's rows in exactly one
    call, so semantics are unchanged.
    """
    import pandas as pd  # noqa: F401

    n_buckets = 64
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.pmod(F.col("o_custkey"), F.lit(n_buckets)).alias("bucket"),
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        g = pdf.groupby("o_custkey")["o_totalprice"]
        mn, mx = g.transform("min"), g.transform("max")
        rng = mx - mn
        out = (pdf["o_totalprice"] - mn) / rng
        out[rng == 0] = 0.5
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "price_norm": out,
            }
        )

    return orders.groupBy("bucket").applyInPandas(
        norm, "o_custkey long, o_orderkey long, price_norm double"
    )


# ---------------------------------------------------------------------------
# E24 — mapInArrow (Arrow-native batch UDF, zero pandas materialization)
# ---------------------------------------------------------------------------


@query(
    "q133_arrow_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DOC_TOK}) AS BIGINT) AS n_tokens,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
    tags=("udf", "mapInArrow", "text"),
)
def q133_arrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/byte counts via ``mapInArrow`` — the
    Arrow-NATIVE member of the UDF matrix (scalar pandas_udf = q22,
    grouped map = q72, mapInPandas = q122, Arrow batches = here).
    The kernel runs entirely in pyarrow.compute (no pandas object
    materialization, no per-row Python), and its tokenizer is the
    exact Arrow twin of functions/textfuncs.tokens: lower -> trim ->
    whitespace split, with the all-whitespace edge case mapped to 0
    (Arrow's split yields [''] there where the JVM filter yields []).

    Scale: mapInArrow streams columnar batches through the Python
    worker with zero conversion cost at either edge — the cheapest
    possible Python touchpoint; the operator is embarrassingly
    parallel (no shuffle). Prefer the JVM expression when one exists
    (q50); this is the template for kernels that genuinely need
    Arrow-side libraries.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            trimmed = pc.utf8_trim_whitespace(pc.utf8_lower(text))
            split = pc.utf8_split_whitespace(trimmed)
            n_tokens = pc.if_else(
                pc.equal(trimmed, ""),
                pa.scalar(0, pa.int32()),
                pc.list_value_length(split),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(n_tokens, pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                ["doc_id", "n_tokens", "n_bytes"],
            )

    return docs.mapInArrow(stats, "doc_id long, n_tokens long, n_bytes long")


# ---------------------------------------------------------------------------
# E24 — Python UDTF (table function: one row in, variable rows out)
# ---------------------------------------------------------------------------


@query(
    "q134_udtf_runlength",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DOC_TOK}) AS token,
             generate_subscripts({_DOC_TOK}, 1) AS pos
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, token, pos,
             CASE WHEN lag(token) OVER (PARTITION BY doc_id ORDER BY pos)
                       IS NOT DISTINCT FROM token
                  THEN 0 ELSE 1 END AS is_start
      FROM tok
    ),
    runs AS (
      SELECT doc_id, token,
             SUM(is_start) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS run_id
      FROM flagged
    )
    SELECT doc_id, CAST(run_id - 1 AS BIGINT) AS run_idx, token,
           COUNT(*) AS run_len
    FROM runs GROUP BY doc_id, run_id, token
    """,
    tags=("udf", "udtf", "text"),
)
def q134_udtf_runlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token run-length encoding via a Python UDTF — the TABLE-function
    member of the UDF matrix (one input row expands to a variable
    number of output rows through arbitrary Python). Emits one row per
    maximal run of consecutive equal tokens; the oracle reproduces the
    semantics with the classic gaps-and-islands window SQL, so the
    UDTF's imperative loop is exact-checked against a declarative
    twin.

    Scale: Arrow-optimized UDTF (useArrow=True — batched transfer,
    not row pickling), applied via a correlated LATERAL join: no
    shuffle, embarrassingly parallel over document partitions. The
    islands formulation (see oracle) is what you'd run when the logic
    fits window functions; the UDTF path exists for expansions that
    don't (parsers, tokenizers, decoders).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="run_idx bigint, token string, run_len bigint", useArrow=True)
    class RunLength:
        def eval(self, text: str):
            if text is None:  # NULL text expands to zero rows, like
                return        # the oracle's unnest of a NULL list
            run_idx = -1
            prev = None
            run_len = 0
            for tok in text.lower().strip().split():
                if tok == prev:
                    run_len += 1
                else:
                    if prev is not None:
                        yield run_idx, prev, run_len
                    run_idx += 1
                    prev, run_len = tok, 1
            if prev is not None:
                yield run_idx, prev, run_len

    spark.udtf.register("q134_runlength", RunLength)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("q134_docs")
    return spark.sql(
        """
        SELECT d.doc_id, r.run_idx, r.token, r.run_len
        FROM q134_docs d, LATERAL q134_runlength(d.text) r
        """
    )


# ---------------------------------------------------------------------------
# E4/E18 — nation-pair trade volume (TPC-H Q7 shape)
# ---------------------------------------------------------------------------


@query(
    "q73_nation_pair_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
        AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "self-join-dim", "agg"),
)
def q73_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations by year (TPC-H Q7
    shape): the nation dimension joins TWICE under different roles
    (supplier side / customer side) with a symmetric pair predicate.

    Scale: both nation joins broadcast; the pair filter cuts the fact
    stream before aggregation; year extraction is scan-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    disc = F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(to_double(F.sum(dec("l_extendedprice") * disc)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# E9/E19 — market-share ratio per year (TPC-H Q8 shape)
# ---------------------------------------------------------------------------


@query(
    "q74_market_share",
    oracle="""
    SELECT o_year,
      CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(25,8)) END) AS VARCHAR) AS DOUBLE)
      / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) AS volume,
             n.n_name AS nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n ON s_nationkey = n.n_nationkey
    ) all_nations
    GROUP BY o_year
    """,
    tags=("agg", "ratio", "join"),
)
def q74_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's supplier market share per order year (TPC-H Q8
    shape): a grouped ratio of conditional decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    volume = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))
    national = F.when(F.col("n_name") == "NATION_3", volume).otherwise(
        F.lit(0).cast("decimal(25,8)")
    )
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (to_double(F.sum(national)) / to_double(F.sum(volume))).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# E4/E9 — distribution of counts (TPC-H Q13 shape)
# ---------------------------------------------------------------------------


@query(
    "q75_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg", "distribution"),
)
def q75_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-customer order counts (TPC-H Q13 shape): LEFT
    join with an ON-clause filter (customers with zero matches count
    as 0 — semantically different from a WHERE filter), then a
    second aggregation over the counts.

    Scale: two shuffles, both combine map-side; the outer join keeps
    every customer row exactly once.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count(orders.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# E9/E15 — argmax against a derived aggregate (TPC-H Q15 shape)
# ---------------------------------------------------------------------------


@query(
    "q76_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                  * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("agg", "subquery", "argmax"),
)
def q76_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum quarterly revenue (TPC-H Q15
    shape): a derived aggregate view joined against its own global
    max — the scalar subquery expressed as a broadcast of a 1-row
    aggregate, exactly how Catalyst de-correlates it.

    Exactness note: the max is selected on the string-routed double,
    so the equality compare sees identical bits on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    disc = F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        to_double(F.sum(dec("l_extendedprice") * disc)).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# E3/E9 — global filtered aggregate (TPC-H Q6 shape)
# ---------------------------------------------------------------------------


@query(
    "q79_forecast_revenue_change",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                * CAST(l_discount AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE)
             AS potential_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg", "scan"),
)
def q79_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue impact of discount elimination (TPC-H Q6 shape): a
    single global aggregate under three pushable predicates — the
    purest scan-bound query; its cost at 100 TB is IO after row-group
    skipping, nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        to_double(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias(
            "potential_revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# E4/E9/E18 — product profit by nation/year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------


@query(
    "q80_product_profit",
    oracle="""
    SELECT nation, o_year,
      CAST(CAST(SUM(
        CAST(l_extendedprice AS DECIMAL(12,4))
          * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
        - CAST(l_quantity AS DECIMAL(12,4))
          * (CAST(p_retailprice AS DECIMAL(12,4)) * CAST(0.20 AS DECIMAL(4,2)))
      ) AS VARCHAR) AS DOUBLE) AS profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice, l_discount, l_quantity, p_retailprice
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation n ON s_nationkey = n.n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit_base
    GROUP BY nation, o_year
    """,
    tags=("join", "agg", "datetime"),
)
def q80_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product profit per supplier nation and order year (TPC-H Q9
    shape; the schema has no partsupp, so unit cost is proxied as 20%
    of retail price — the join/aggregate topology is Q9's).

    Scale: the p_name LIKE filter prunes part before its broadcast;
    the decimal profit expression keeps mixed +/- aggregation exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    ) - dec("l_quantity") * (
        dec("p_retailprice") * F.lit(0.20).cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(to_double(F.sum(profit)).alias("profit"))
    )


# ---------------------------------------------------------------------------
# E4/E9/E15 — returned-item ranking (TPC-H Q10 shape)
# ---------------------------------------------------------------------------


@query(
    "q81_returned_item_ranking",
    oracle="""
    SELECT c_custkey, c_name, n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS VARCHAR) AS DOUBLE)
        AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q81_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in a quarter (TPC-H Q10
    shape): selective fact filter -> star join -> aggregate -> top-20
    with deterministic tiebreak."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    disc = F.lit(1).cast("decimal(12,4)") - dec("l_discount")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(to_double(F.sum(dec("l_extendedprice") * disc)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E9 + scalar threshold — important inventory share (TPC-H Q11 shape)
# ---------------------------------------------------------------------------


@query(
    "q82_important_part_value",
    oracle="""
    WITH part_value AS (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                  * CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS value
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT SUM(value) AS t, COUNT(*) AS n FROM part_value)
    SELECT pv.l_partkey, pv.value
    FROM part_value pv CROSS JOIN total
    WHERE pv.value > 1.5 * total.t / total.n
    """,
    tags=("agg", "subquery", "threshold"),
)
def q82_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts representing a significant share of total traded value
    (TPC-H Q11 shape; no partsupp table, so value = shipped
    price x quantity): per-group aggregate filtered against a scaled
    global scalar (1.5x the average part value — scale-free, unlike a
    fixed share), broadcast not collected.

    Exactness: both sides are string-routed doubles and the threshold
    is the same double product -> identical comparisons.
    """
    li = load_table(spark, sf_dir, "lineitem")
    value = dec("l_extendedprice") * dec("l_quantity")
    part_value = li.groupBy("l_partkey").agg(
        to_double(F.sum(value)).alias("value")
    )
    total = part_value.agg(
        F.sum("value").alias("t"), F.count(F.lit(1)).alias("n")
    )
    return (
        part_value.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(1.5) * F.col("t") / F.col("n"))
        .select("l_partkey", "value")
    )


# ---------------------------------------------------------------------------
# E6 nested — dominant suppliers of a brand (TPC-H Q20 shape)
# ---------------------------------------------------------------------------


@query(
    "q83_dominant_brand_suppliers",
    oracle="""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'
    ),
    supplier_part_qty AS (
      SELECT l_suppkey, l_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS sq
      FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
      GROUP BY l_suppkey, l_partkey
    ),
    part_qty AS (
      SELECT l_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS VARCHAR) AS DOUBLE) AS tq,
             COUNT(DISTINCT l_suppkey) AS ns
      FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
      GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM supplier_part_qty spq
      JOIN part_qty pq ON pq.l_partkey = spq.l_partkey
      WHERE spq.l_suppkey = s.s_suppkey AND spq.sq > 2.0 * pq.tq / pq.ns
    )
    """,
    tags=("semi", "agg", "nested"),
)
def q83_dominant_brand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped a dominant share (2x the average
    supplier share) of any Brand#2 part's volume (TPC-H Q20 shape):
    nested aggregates feeding a semi join — the 'excess stock'
    topology without the partsupp table, with a scale-free dominance
    threshold.

    Scale: both aggregates shrink before the semi join; the brand
    filter prunes part first and broadcasts.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey")
    )
    spq = li.groupBy("l_suppkey", "l_partkey").agg(
        to_double(F.sum(dec("l_quantity"))).alias("sq")
    )
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        to_double(F.sum(dec("l_quantity"))).alias("tq"),
        F.count_distinct("l_suppkey").alias("ns"),
    )
    dominant = (
        spq.join(F.broadcast(pq), spq.l_partkey == pq.pq_partkey)
        .filter(F.col("sq") > F.lit(2.0) * F.col("tq") / F.col("ns"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# E6 multi-condition — sole-late-supplier ranking (TPC-H Q21 shape)
# ---------------------------------------------------------------------------


@query(
    "q84_sole_late_suppliers",
    oracle="""
    WITH order_stats AS (
      SELECT l.l_orderkey,
             COUNT(DISTINCT l.l_suppkey) AS n_supps,
             COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                                 THEN l.l_suppkey END) AS n_late_supps
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey
    ),
    late_items AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late_items li
    JOIN order_stats os
      ON os.l_orderkey = li.l_orderkey
         AND os.n_supps > 1 AND os.n_late_supps = 1
    JOIN supplier s ON s.s_suppkey = li.l_suppkey
    GROUP BY s.s_name
    """,
    tags=("agg", "multi-exists", "join"),
)
def q84_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on multi-supplier
    orders (TPC-H Q21 shape — the hardest TPC-H topology). The
    classic EXISTS/NOT-EXISTS pair over self-joined lineitem is
    expressed as order-level aggregates (supplier count, late-supplier
    count) joined back — identical semantics, one pass over the fact
    table instead of three.

    Scale: this rewrite is exactly what you do at 100 TB — the
    aggregate join-back shuffles lineitem once; the EXISTS form would
    shuffle it three times.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, orders.o_orderkey == li.l_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "is_late"
        ),
    )
    order_stats = joined.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supps"),
    )
    late_items = (
        joined.filter(F.col("is_late")).select("l_orderkey", "l_suppkey").distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    qualifying = late_items.join(
        order_stats.filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)),
        "l_orderkey",
    )
    return (
        qualifying.join(F.broadcast(supp), supp.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# E4 — full outer join (one-side-only keys on both sides)
# ---------------------------------------------------------------------------


@query(
    "q86_full_outer_year_activity",
    oracle="""
    WITH order_years AS (
      SELECT CAST(year(o_orderdate) AS INT) AS y, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    ship_years AS (
      SELECT CAST(year(l_shipdate) AS INT) AS y, COUNT(*) AS n_shipments
      FROM lineitem GROUP BY 1
    )
    SELECT coalesce(o.y, s.y) AS year,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(s.n_shipments, 0) AS n_shipments
    FROM order_years o FULL OUTER JOIN ship_years s ON o.y = s.y
    """,
    tags=("join", "full-outer", "agg"),
)
def q86_full_outer_year_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order activity vs shipment activity per year via FULL OUTER
    join — ship years extend past the last order year, so both
    null-padded sides occur (left/right outer are the degenerate
    halves of this plan; q75 covers left).

    Scale: full outer forces a shuffle join (no broadcast path);
    both inputs here are pre-aggregated to year granularity first so
    the expensive join touches dozens of rows, not the fact tables.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    oy = orders.groupBy(F.year("o_orderdate").alias("oy")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    sy = li.groupBy(F.year("l_shipdate").alias("sy")).agg(
        F.count(F.lit(1)).alias("n_shipments")
    )
    return oy.join(sy, oy.oy == sy.sy, "full_outer").select(
        F.coalesce(F.col("oy"), F.col("sy")).alias("year"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("n_shipments"), F.lit(0)).alias("n_shipments"),
    )


# ---------------------------------------------------------------------------
# E16 — bag-semantics set operations (ALL variants)
# ---------------------------------------------------------------------------


@query(
    "q87_bag_set_ops",
    oracle="""
    WITH a AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 0),
         b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'intersect_all' AS tag, c_nationkey FROM (
      SELECT c_nationkey FROM a INTERSECT ALL SELECT c_nationkey FROM b
    )
    UNION ALL
    SELECT 'except_all' AS tag, c_nationkey FROM (
      SELECT c_nationkey FROM a EXCEPT ALL SELECT c_nationkey FROM b
    )
    """,
    tags=("setops", "bag"),
)
def q87_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicate
    multiplicities are min'd / subtracted, not collapsed), the
    complement of q13's distinct-set variants."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 0).select("c_nationkey")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return (
        a.intersectAll(b).withColumn("tag", F.lit("intersect_all"))
        .unionByName(a.exceptAll(b).withColumn("tag", F.lit("except_all")))
        .select("tag", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# E22 inverse — unpivot / melt
# ---------------------------------------------------------------------------


@query(
    "q88_unpivot",
    oracle="""
    SELECT o_orderkey, metric, value
    FROM (
      SELECT o_orderkey, o_totalprice,
             CAST(o_custkey AS DOUBLE) AS custkey_as_metric
      FROM orders WHERE o_orderkey <= 1000
    )
    UNPIVOT (value FOR metric IN (o_totalprice, custkey_as_metric))
    """,
    tags=("unpivot", "reshape"),
)
def q88_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns to (key, metric, value)
    rows — the inverse of q19's pivot, used to normalize metric tables
    before generic aggregation.

    Scale: unpivot is a row-local Expand (k output rows per input
    row), pipelined with no shuffle.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_custkey").cast("double").alias("custkey_as_metric"),
        )
    )
    return orders.unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "custkey_as_metric"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# E19 bitwise — Morton z-values (the data-skipping sort key, checkable)
# ---------------------------------------------------------------------------


@query(
    "q91_zorder_values",
    oracle=f"""
    SELECT o_orderkey,
           CAST({" + ".join(
               f"(((o_custkey >> {i}) % 2) << {2 * i})"
               f" + (((o_orderkey >> {i}) % 2) << {2 * i + 1})"
               for i in range(16)
           )} AS BIGINT) AS zval
    FROM orders
    WHERE o_orderkey <= 4000
    """,
    tags=("scalar", "bitwise", "zorder"),
)
def q91_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) interleave of two integer keys — the sort key
    behind plans/zorder.write_zordered, exposed as a checkable scalar
    query (bitwise shift/mask surface; exact integer math)."""
    from target_hdfs_spark.plans.zorder import zvalue

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    return orders.select(
        "o_orderkey",
        zvalue(F.col("o_custkey"), F.col("o_orderkey")).alias("zval"),
    )


# ---------------------------------------------------------------------------
# Data-quality profiling: per-column null / distinct / range summary —
# the first job any pipeline runs against a new 100 TB drop
# ---------------------------------------------------------------------------


@query(
    "q97_table_profile",
    oracle="""
    SELECT 'l_orderkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           MIN(l_returnflag), MAX(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
           CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
           CAST(CAST(MIN(l_quantity) AS DECIMAL(12,2)) AS VARCHAR),
           CAST(CAST(MAX(l_quantity) AS DECIMAL(12,2)) AS VARCHAR)
    FROM lineitem
    """,
    tags=("profile", "quality", "agg"),
)
def q97_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of lineitem (row count, null
    count, exact distinct count, min/max rendered as strings): the
    schema-on-read sanity check a training pipeline runs before
    touching a new data drop. Doubles are profiled through a
    DECIMAL(12,2) cast so both engines render ranges identically
    (raw double-to-string formatting diverges between engines).

    Scale: one pass per column with map-side combine; the exact
    distinct count is the one shuffle-heavy term — swap in
    approx_count_distinct (q20) when exactness isn't required.
    """
    li = load_table(spark, sf_dir, "lineitem")

    def profile(col: str, min_max_cast: str | None = None) -> DataFrame:
        c = F.col(col)
        mn, mx = F.min(c), F.max(c)
        if min_max_cast:
            mn, mx = mn.cast(min_max_cast), mx.cast(min_max_cast)
        return li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
            F.count_distinct(c).alias("n_distinct"),
            mn.cast("string").alias("min_value"),
            mx.cast("string").alias("max_value"),
        ).select(F.lit(col).alias("column_name"), "*")

    parts = [
        profile("l_orderkey"),
        profile("l_returnflag"),
        profile("l_shipdate"),
        profile("l_quantity", "decimal(12,2)"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# E12 companion: EXACT interpolated percentiles (the value-checkable
# twin of q20's sketches)
# ---------------------------------------------------------------------------


@query(
    "q99_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS price_p25,
           quantile_cont(l_extendedprice, 0.50) AS price_p50,
           quantile_cont(l_extendedprice, 0.75) AS price_p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q99_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group: both engines
    compute (1-h)*lo + h*hi over the same sorted values, so the result
    is value-exact across engines — upgrading the percentile surface
    from q20's rows-only sketches to a hard-signal check.

    Scale: exact percentiles materialize per-group sorted values (the
    cost q20's KLL sketch avoids); use this form when groups are
    bounded, the sketch when they are not.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("price_p25"),
        F.percentile("l_extendedprice", F.lit(0.50)).alias("price_p50"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("price_p75"),
    )


# ---------------------------------------------------------------------------
# E9/E12 extension: robust (trimmed) aggregation — rank-based tail cut
# ---------------------------------------------------------------------------


@query(
    "q112_trimmed_mean",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n_kept,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))
                     AS VARCHAR) AS DOUBLE) / COUNT(*) AS trimmed_mean,
           MIN(l_extendedprice) AS lo_cut,
           MAX(l_extendedprice) AS hi_cut
    FROM r
    WHERE rn > n // 20 AND rn <= n - n // 20
    GROUP BY l_returnflag
    """,
    tags=("agg", "robust", "window"),
)
def q112_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per group: rank-cut both tails, aggregate the
    middle 90% (robust location estimate — outlier-resistant quality
    stats for pipeline monitoring). Exact despite ties: the sort key
    IS the aggregated value, so equal-keyed rows are interchangeable
    and the trimmed multiset is deterministic; the mean goes through
    the decimal-sum/string route.

    Scale shape: one hash shuffle on the group key; rank and count are
    two window passes over the SAME partitioning (no extra Exchange),
    and the cut happens before the aggregate, so only the kept rows
    feed the final agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = r.where(
        (F.col("rn") > F.expr("n DIV 20"))
        & (F.col("rn") <= F.col("n") - F.expr("n DIV 20"))
    )
    return kept.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_kept"),
        (to_double(F.sum(dec("l_extendedprice"))) / F.count(F.lit(1))).alias(
            "trimmed_mean"
        ),
        F.min("l_extendedprice").alias("lo_cut"),
        F.max("l_extendedprice").alias("hi_cut"),
    )


# ---------------------------------------------------------------------------
# E25 (surface): the spark.sql front-end — same engine, SQL text in
# ---------------------------------------------------------------------------

_Q154_SQL = """
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n_items,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS STRING) AS DOUBLE)
        AS sum_qty,
      COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS n_ship_days
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@query(
    "q154_sql_frontend",
    oracle=_Q154_SQL,
    tags=("sql", "scan", "agg"),
)
def q154_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal ``spark.sql`` entry point: register the engine's
    table readers as temp views and run SQL TEXT — the exact string
    the DuckDB oracle runs (one source of truth; the decimal→varchar→
    double convention is ANSI-portable by design, which this query
    proves by construction).

    A user of the reference migrating SQL workloads gets this path:
    same Catalyst plan as the DataFrame API (views are lazy logical
    plans over the parquet scans — pushdown and pruning identical).

    Scale: plan-equivalent to q01's shape (scan-side filter, map-side
    partial aggregation, 6-group shuffle).
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q154_SQL)
