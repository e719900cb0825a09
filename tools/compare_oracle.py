#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles. Usage: compare_oracle.py <sfDir> <verifyOut>

Driver-side tooling only (python/duckdb are not available to the Scala
library); used during development to catch oracle drift before the round
gate runs.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: spark output missing")
        fails += 1
        continue
    files = glob.glob(f"{spark_dir}/*.parquet")
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    # driver-style compare: sort columns by name, then row-sort, hash values
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}")
        fails += 1
        continue
    g = got[gc].sort_values(by=gc).reset_index(drop=True)
    w = want[wc].sort_values(by=wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        fails += 1
        continue
    import pandas as pd
    eq = g.astype(str).equals(w.astype(str))
    if not eq:
        diff = (g.astype(str) != w.astype(str)).any(axis=1)
        print(f"FAIL {name}: value mismatch, first rows:")
        print(" spark:", g[diff].head(3).to_dict("records"))
        print(" duck :", w[diff].head(3).to_dict("records"))
        fails += 1
    else:
        # dtype sanity (schema-ish check)
        dt_g = [str(t) for t in g.dtypes]
        dt_w = [str(t) for t in w.dtypes]
        note = "" if dt_g == dt_w else f"  [dtype note: {dt_g} vs {dt_w}]"
        print(f"PASS {name}: {len(g)} rows{note}")
print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
