#!/usr/bin/env python3
"""Mimic the driver's CORRECTNESS gate: run each oracle SQL in DuckDB
over the sf parquet tables, sort columns by name + rows, diff against
the Spark parquet dump from graft.Verify."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize types for hashing: floats rounded, everything to str
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            s = s.round(6)
        out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

fails = 0
for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
    name = os.path.basename(qdir)
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracles:
        print(f"{name}: rows-only ({len(spark_df)} rows)")
        if len(spark_df) == 0 and name != "q_dup_id_check":
            print(f"  WARN: zero rows");
        continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        fails += 1; continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}")
        fails += 1; continue
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        print(f"{name}: VALUE MISMATCH on {neq.sum()}/{len(a)} rows")
        idx = neq.idxmax()
        print("  spark :", a.loc[idx].to_dict())
        print("  oracle:", b.loc[idx].to_dict())
        fails += 1; continue
    print(f"{name}: OK ({len(a)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
