"""Audit every registered query for driver-canonicalizer hazards.

The driver compares Spark vs DuckDB results by loading both into
pandas, sorting by all columns, and hashing values. Two hazard
classes broke round 1:

1. list/struct/map cells — pandas ``sort_values`` raises
   ``TypeError: unhashable type: 'list'`` (q20, q38);
2. dtype mismatches — DuckDB HUGEINT (int128 from SUM over ints)
   lands in pandas as float64/object while Spark emits int64, so
   equal values hash differently (q66).

This script runs each query + oracle at sf0.001 and flags:
- any complex-typed (array/map/struct) Spark output column;
- any pandas-dtype difference between the two frames;
- any object-dtype column whose cells are not str/bytes/date-like;
- sort_values failures on either frame.

Usage: python scripts/audit_canon.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pandas as pd
from pyspark.sql import types as T

from target_hdfs_spark.registry import all_queries
from target_hdfs_spark.session import get_spark
from tests.oracle_compare import duckdb_conn


def complex_cols(schema):
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def try_sort(df: pd.DataFrame) -> str | None:
    try:
        df.sort_values(by=list(df.columns))
        return None
    except Exception as e:  # noqa: BLE001
        return f"{type(e).__name__}: {e}"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]
    spark = get_spark()
    con = duckdb_conn(sf_dir)
    problems = 0
    for name, spec in sorted(all_queries().items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        flags = []
        try:
            sdf = spec.fn(spark, sf_dir)
            cc = complex_cols(sdf.schema)
            if cc:
                flags.append(f"COMPLEX spark cols: {cc}")
            spdf = sdf.toPandas()
            err = try_sort(spdf)
            if err:
                flags.append(f"spark sort fails: {err}")
        except Exception as e:  # noqa: BLE001
            flags.append(f"SPARK RUN FAILED: {type(e).__name__}: {e}")
            spdf = None
        ddf = None
        if spec.oracle is not None:
            try:
                ddf = con.execute(spec.oracle).df()
                err = try_sort(ddf)
                if err:
                    flags.append(f"duck sort fails: {err}")
            except Exception as e:  # noqa: BLE001
                flags.append(f"ORACLE RUN FAILED: {type(e).__name__}: {e}")
        if spdf is not None and ddf is not None:
            s_t = {c.lower(): str(t) for c, t in spdf.dtypes.items()}
            d_t = {c.lower(): str(t) for c, t in ddf.dtypes.items()}
            if set(s_t) != set(d_t):
                flags.append(f"col sets differ: spark={sorted(s_t)} duck={sorted(d_t)}")
            else:
                for c in sorted(s_t):
                    if s_t[c] != d_t[c]:
                        flags.append(f"dtype {c}: spark={s_t[c]} duck={d_t[c]}")
        if flags:
            problems += 1
            print(f"!! {name}")
            for fl in flags:
                print(f"     {fl}")
        else:
            print(f"ok {name}")
    print(f"\n{problems} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
