"""Simulate the round driver: importlib-load __spark_entry__.py,
run entry() plus every queries() entry at the gate SF and compare
against oracle_sql() in DuckDB (verify-skill recipe).

Side effect: writes per-query wall times to SIM_TIMINGS.json at the
repo root — bench.py unions the slowest sim queries into its headline
set, so an expensive operator can never hide outside the bench."""

from __future__ import annotations

import importlib.util
import json
import sys
import time

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional: restrict to queries whose name contains any given substring
# (targeted re-checks while iterating; SIM_TIMINGS.json is only written
# on FULL runs so bench.py's auto-headliner pick never sees partial data)
ONLY = sys.argv[2:]

spec = importlib.util.spec_from_file_location("__spark_entry__", "__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

n = mod.entry(spark).count()
print(f"entry(): {n} rows", flush=True)
assert n >= 0

from tests.oracle_compare import _normalize, duckdb_conn  # noqa: E402

queries = mod.queries()
oracles = mod.oracle_sql()
if ONLY:
    queries = {
        n: f for n, f in queries.items() if any(pat in n for pat in ONLY)
    }
con = duckdb_conn(SF_DIR)
fails = []
sim_times: dict[str, float] = {}
t_all = time.time()
for name, fn in queries.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        spark_cols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        fails.append((name, f"SPARK ERR {type(e).__name__}: {e}"))
        print(f"ERR  {name}: spark {type(e).__name__}", flush=True)
        continue
    sim_times[name] = round(time.time() - t0, 3)  # Spark-side wall only
    if name not in oracles:
        print(f"rows {name}: {len(srows)} rows ({time.time()-t0:.1f}s)", flush=True)
        continue
    try:
        cur = con.execute(oracles[name])
        duck_cols = [d[0].lower() for d in cur.description]
        drows = cur.fetchall()
    except Exception as e:  # noqa: BLE001
        fails.append((name, f"ORACLE ERR {type(e).__name__}: {e}"))
        print(f"ERR  {name}: oracle {type(e).__name__}: {e}", flush=True)
        continue
    prob = None
    if sorted(spark_cols) != sorted(duck_cols):
        prob = f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    elif len(srows) != len(drows):
        prob = f"rowcount spark={len(srows)} duck={len(drows)}"
    else:
        s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        if _normalize(srows, s_order) != _normalize(drows, d_order):
            prob = "values differ"
    if prob:
        fails.append((name, prob))
        print(f"FAIL {name}: {prob}", flush=True)
    else:
        print(f"ok   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)

if not ONLY:
    with open("SIM_TIMINGS.json", "w") as fh:
        json.dump({"sf_dir": SF_DIR, "spark_wall_sec": sim_times}, fh, indent=1)

print(f"\ntotal {time.time()-t_all:.1f}s; {len(fails)} failures", flush=True)
for name, prob in fails:
    print(f"  {name}: {prob}")
sys.exit(1 if fails else 0)
