#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
the sfDir parquet tables registered as views, read the Spark result parquet,
sort columns by name + rows by all columns, and compare cell-by-cell
(exact; doubles also reported with max abs diff when not bit-equal).
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns got={list(got.columns)} want={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows got={len(got)} want={len(want)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            g, w = got[c].values, want[c].values
            if g.dtype.kind == 'f' or w.dtype.kind == 'f':
                gf, wf = g.astype(float), w.astype(float)
                eq = (gf == wf) | (np.isnan(gf) & np.isnan(wf))
                both = ~(np.isnan(gf) | np.isnan(wf))
                if not eq.all():
                    mx = np.abs(gf[both] - wf[both]).max() if both.any() else float('nan')
                    bad.append(f"{c}: {int((~eq).sum())} diffs, maxabs={mx:.3e}")
            else:
                eq = pd.Series(g).astype(str).values == pd.Series(w).astype(str).values
                if not eq.all():
                    i = int(np.argmax(~eq))
                    bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: got={g[i]!r} want={w[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
