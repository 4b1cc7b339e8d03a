#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
  (run AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`)

Loads each <outDir>/<name> parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over the same testdata tables,
and compares: schema (column names), row count, and values (exact, after
sorting columns by name and rows by all columns). Prints per-query status.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    con = duckdb.connect()
    df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    con.close()
    return df

def normalize(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        try:
            import numpy as np
            if str(df[c].dtype).startswith(("int", "uint", "Int")):
                df[c] = df[c].astype("int64")
            elif str(df[c].dtype).startswith("float"):
                df[c] = df[c].astype("float64")
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(set(list(oracle.keys()) +
                       [os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)]))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"MISSING-SPARK {name}"); n_fail += 1; continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:14s} {name} rows={len(spark_df)}"); n_rowsonly += 1; continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR    {name}: {e}"); n_fail += 1; continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA-DIFF   {name}: spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"ROWS-DIFF     {name}: spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        if s.equals(d):
            print(f"PASS          {name} rows={len(s)}"); n_pass += 1
        else:
            diff_cols = [c for c in s.columns if not s[c].equals(d[c])]
            print(f"VALUES-DIFF   {name}: cols={diff_cols}")
            for c in diff_cols[:3]:
                neq = s[c] != d[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   [{i}] {c}: spark={s[c][i]!r} duck={d[c][i]!r}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)

main()
