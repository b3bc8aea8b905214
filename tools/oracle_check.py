"""Oracle-compare SPECIFIC queries by name (same normalize/compare logic as
tools/driver_sim.py, which only takes a count). Used during optimization to
re-prove equivalence of just-touched queries without a full replay.

Usage: python tools/oracle_check.py [--sf DIR] <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from vectordb_data_ingestion_spark.session import ALL_TABLE_NAMES, get_spark  # noqa: E402

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]

spark = get_spark(app_name="oracle_check", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ALL_TABLE_NAMES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs = E.queries()
osql = E.oracle_sql()


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].map(lambda x: x.isoformat() if x is not None else None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


fails = []
for i, name in enumerate(args):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
        if name not in osql:
            print(f"{i:2d} {name}: rows-only {len(sdf)} ({time.time()-t0:.1f}s)", flush=True)
            continue
        odf = con.execute(osql[name]).df()
        a, b = norm(sdf), norm(odf)
        ok = list(a.columns) == list(b.columns) and len(a) == len(b) and a.equals(b)
        if not ok:
            fails.append(name)
        print(
            f"{i:2d} {name}: {'OK' if ok else f'FAIL rows={len(a)}vs{len(b)}'}"
            f" rows={len(a)} ({time.time()-t0:.1f}s)",
            flush=True,
        )
    except Exception as ex:
        fails.append(name)
        print(f"{i:2d} {name}: EXC {type(ex).__name__}: {str(ex)[:150]}", flush=True)

print("FAILS:", fails)
sys.exit(1 if fails else 0)
