"""Local mirror of the driver's correctness gate: run a registered
query on Spark and its oracle on DuckDB over the same parquet tables,
then compare row count, column names, and order-insensitive values
EXACTLY (the engine's determinism conventions are designed to make
exact comparison possible — any mismatch is a bug, not noise)."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from target_hdfs_spark.sources.readers import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return "s:" + str(v)


def _normalize(rows, col_order):
    out = [
        tuple(_norm_cell(row[i]) for i in col_order)
        for row in rows
    ]
    out.sort()
    return out


def compare_query(spark, spec, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = spec.fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    cur = con.execute(spec.oracle)
    duck_cols = [d[0].lower() for d in cur.description]
    drows = cur.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_norm = _normalize(srows, s_order)
    d_norm = _normalize(drows, d_order)
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ]
        only_s = [r for r in s_norm if r not in set(d_norm)][:3]
        only_d = [r for r in d_norm if r not in set(s_norm)][:3]
        problems.append(
            f"values differ ({len(diffs)} positional diffs); "
            f"spark-only sample={only_s}; duck-only sample={only_d}; "
            f"cols={sorted(spark_cols)}"
        )
    return problems
