#!/usr/bin/env python3
"""Driver-mimic correctness check: for each query output written by
graft.Verify, run the oracle SQL in DuckDB over the same sf dir tables and
compare (schema column names, row count, content hash over rows sorted by
all columns with columns ordered by name)."""
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(payload.encode()).hexdigest()


n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        n_fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:160]}")
        n_fail += 1
        continue
    ok_schema = sorted(got.columns) == sorted(want.columns)
    ok_rows = len(got) == len(want)
    ok_hash = ok_schema and ok_rows and canon(got) == canon(want)
    status = "PASS" if ok_hash else "FAIL"
    if ok_hash:
        n_pass += 1
    else:
        n_fail += 1
    print(f"{name}: {status} (schema={ok_schema} rows={len(got)}/{len(want)})")
    if not ok_hash and ok_schema and ok_rows:
        g = got.reindex(sorted(got.columns), axis=1).sort_values(by=sorted(got.columns), kind="mergesort").reset_index(drop=True)
        w = want.reindex(sorted(want.columns), axis=1).sort_values(by=sorted(want.columns), kind="mergesort").reset_index(drop=True)
        neq = (g != w) & ~(g.isna() & w.isna())
        bad = neq.any(axis=1)
        print("  first diffs:")
        print(pd.concat([g[bad].head(3).add_suffix("_got"),
                         w[bad].head(3).add_suffix("_want")], axis=1).to_string()[:600])

rows_only = sorted(set(f.split("/")[-1] for f in glob.glob(f"{OUT}/*") if "/" in f)
                   - set(oracle) - {"oracle_sql.json"})
print(f"\noracle: {n_pass} pass, {n_fail} fail; rows-only queries: {rows_only}")
