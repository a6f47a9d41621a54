#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle gate.

Usage: check.py <sfDir> <verifyOut>
Loads each verifyOut/<name> parquet (Spark result), runs oracle_sql.json[name]
in DuckDB over views on sfDir parquet, normalizes (sort cols by name, sort
rows, stringify with rounding-stable repr) and diffs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)): return "NULL"
        if isinstance(v, (pd.Timestamp, np.datetime64)):
            s = pd.Timestamp(v).floor("us").isoformat()
            return s[:-9] if s.endswith("T00:00:00") else s
        if isinstance(v, (float, np.floating)):
            return f"{float(v):.6g}"
        if isinstance(v, (np.integer,)): return str(int(v))
        if hasattr(v, "isoformat"): return v.isoformat()[:26]
        return str(v)
    s = df.map(cell)
    return s.sort_values(by=list(s.columns)).reset_index(drop=True)

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {e}")); continue
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"COLS spark={list(a.columns)} duck={list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((name, f"ROWS spark={len(a)} duck={len(b)}")); continue
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        fails.append((name, f"VALUES first diff row {i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}"))
        continue
    print(f"  OK  {name} ({len(a)} rows)")

print()
if fails:
    for n, msg in fails: print(f"FAIL {n}: {msg}")
    print(f"\n{len(oracle)-len(fails)}/{len(oracle)} match")
    sys.exit(1)
print(f"ALL {len(oracle)}/{len(oracle)} MATCH")
