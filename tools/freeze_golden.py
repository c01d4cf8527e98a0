#!/usr/bin/env python3
"""Freeze golden oracle tables for the fixture-corpus queries.

Reads a graft.Verify output dir and emits, for each named query, a
self-contained DuckDB `SELECT ... FROM (VALUES ...)` statement into
src/main/resources/graft/golden/<name>.sql. These become the DuckDB
oracles for queries whose semantics are row-local HTML extraction with
no SQL restatement: the golden pins the (ScalaTest-verified) output so
the driver's CORRECTNESS gate covers them too.

Usage: python3 tools/freeze_golden.py /tmp/verify_out [q_name ...]
"""
import sys, os, glob
import numpy as np
import pandas as pd

GOLDEN_QUERIES = ["q_mstr_reports", "q_mstr_nodes", "q_mstr_edges",
                  "q_mstr_validate", "q_mstr_join", "q_web_pipeline"]

out_root = os.path.join(os.path.dirname(__file__), "..",
                        "src", "main", "resources", "graft", "golden")
os.makedirs(out_root, exist_ok=True)

verify_dir = sys.argv[1]
names = sys.argv[2:] or GOLDEN_QUERIES


def lit(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if bool(v) else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        raise SystemExit("float golden columns unsupported (rounding ambiguity)")
    s = str(v)
    if any(ord(c) < 0x20 for c in s):
        raise SystemExit(f"control char in golden value {s!r}")
    return "'" + s.replace("'", "''") + "'"


for name in names:
    files = glob.glob(os.path.join(verify_dir, name, "*.parquet"))
    if not files:
        raise SystemExit(f"no spark output for {name} under {verify_dir}")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    cols = ", ".join(df.columns)
    rows = ",\n".join(
        "  (" + ", ".join(lit(v) for v in rec) + ")"
        for rec in df.itertuples(index=False, name=None))
    sql = f"SELECT {cols} FROM (VALUES\n{rows}\n) AS golden({cols})"
    path = os.path.join(out_root, f"{name}.sql")
    with open(path, "w", encoding="utf-8") as f:
        f.write(sql + "\n")
    print(f"{name}: froze {len(df)} rows -> {os.path.relpath(path)}")
