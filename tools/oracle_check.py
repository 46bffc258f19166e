#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL
in DuckDB against the sfDir parquet tables, load the Spark parquet dump from
Verify, sort columns by name + rows, and compare values. Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    sdf = pd.read_parquet(spark_dir)
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    # normalize: sort columns by name, sort rows on RAW cells (mimics the
    # driver's comparator — an array/struct cell must fail HERE, not only
    # at the gate), then stringify for the value compare
    def norm(df):
        df = df[sorted(df.columns)].copy()
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df
    a, b = norm(sdf), norm(odf)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
        fail += 1
        continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
        fail += 1
        continue
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        print(f"FAIL {name}: first diff row {i}\n  spark:  {a.iloc[i].to_dict()}\n  oracle: {b.iloc[i].to_dict()}")
        fail += 1
        continue
    print(f"OK   {name}: {len(a)} rows")
print("RESULT:", "FAIL" if fail else "ALL OK", f"({len(oracle)-fail}/{len(oracle)})")
sys.exit(1 if fail else 0)
