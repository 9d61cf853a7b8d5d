#!/usr/bin/env python3
"""Row-level engine-vs-oracle diff for one query.

Usage: diffq.py <sfDir> <verifyOutDir> <query> [--ordered]
Prints the rows where the two sides disagree (after the same column-sort +
row-sort normalization oracle_check.py uses, or emitted order with --ordered).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
ordered = "--ordered" in sys.argv[4:]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
want = con.execute(sql).df()
got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and not ordered:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)

got, want = norm(got), norm(want)
print(f"rows: got={len(got)} want={len(want)}")
n = min(len(got), len(want))
shown = 0
for i in range(n):
    g, w = got.iloc[i], want.iloc[i]
    if list(map(str, g.values)) != list(map(str, w.values)):
        print(f"--- row {i}\n got: {dict(g)}\nwant: {dict(w)}")
        shown += 1
        if shown >= int(sys.argv[sys.argv.index('-n')+1]) if '-n' in sys.argv else shown >= 8:
            break
if len(got) != len(want):
    longer, tag = (got, 'got') if len(got) > len(want) else (want, 'want')
    print(f"extra {tag} rows:")
    print(longer.iloc[n:].head(10).to_string())
