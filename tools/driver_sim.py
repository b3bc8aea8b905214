import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled","false")
         .config("spark.driver.memory","48g")
         .getOrCreate())
import __spark_entry__ as E

# entry smoke
rows = E.entry(spark).collect()
print(f"entry smoke: {len(rows)} rows", flush=True)

import duckdb, pandas as pd
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
from vectordb_data_ingestion_spark.session import ALL_TABLE_NAMES
for t in ALL_TABLE_NAMES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries(); osql = E.oracle_sql()
# default mirrors the driver's 50-query window; `python tools/driver_sim.py
# all` (or an integer) widens to the FULL registry — the once-per-round
# 162/162 pass the r5 judge asked for (item 6)
arg = sys.argv[1] if len(sys.argv) > 1 else "50"
names = list(qs) if arg == "all" else list(qs)[: int(arg)]
fails = []
def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify dtypes before compare: Spark float32/int32 vs DuckDB
        # float64/int64 must not read as a value mismatch
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")  # not float64: >2^53 ids survive
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].map(lambda x: x.isoformat() if x is not None else None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

for i, name in enumerate(names):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
        if name not in osql:
            print(f"{i:2d} {name}: rows-only {len(sdf)} ({time.time()-t0:.1f}s)", flush=True)
            continue
        odf = con.execute(osql[name]).df()
        a, b = norm(sdf), norm(odf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "OK" if ok_vals else f"FAIL cols={ok_cols} rows={len(a)}vs{len(b)} vals={ok_vals}"
        if not ok_vals: fails.append(name)
        print(f"{i:2d} {name}: {status} rows={len(a)} ({time.time()-t0:.1f}s)", flush=True)
    except Exception as ex:
        fails.append(name)
        print(f"{i:2d} {name}: EXC {type(ex).__name__}: {str(ex)[:150]}", flush=True)
print("FAILS:", fails)
sys.exit(1 if fails else 0)
