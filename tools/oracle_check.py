#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [--ordered]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
the sfDir parquet tables registered as views, read the Spark result parquet,
sort columns by name + rows by all columns, and compare cell-by-cell
(exact; doubles also reported with max abs diff when not bit-equal).

--ordered additionally compares rows in EMITTED order (Spark's coalesce(1)
parquet read top-to-bottom vs DuckDB's ORDER BY order) — the driver's hash
is row-order sensitive, so a query whose multiset matches but whose null
keys sort NULLS FIRST in Spark / NULLS LAST in DuckDB is red on the driver
yet green in the sorted compare. Such queries report ORDER-FAIL.
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

def norm_ordered(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)

def cells_equal(got: pd.DataFrame, want: pd.DataFrame):
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
            # None (object col) and NaN (float-promoted col) are the same
            # missing value; date vs midnight-datetime is the same instant
            # (Spark parquet yields datetime.date, DuckDB datetime64[ns]) —
            # normalize both before the string compare
            def canon(v):
                if pd.isna(v):
                    return "<NA>"
                if isinstance(v, np.datetime64):
                    v = pd.Timestamp(v)
                if isinstance(v, pd.Timestamp):
                    return v.date().isoformat() if v == v.normalize() else v.isoformat()
                return str(v)
            gs = pd.Series(g).map(canon).values
            ws = pd.Series(w).map(canon).values
            eq = gs == ws
            if not eq.all():
                i = int(np.argmax(~eq))
                bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: got={g[i]!r} want={w[i]!r}")
    return bad

def main(sf_dir: str, out_dir: str, ordered: bool = False) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_order = 0
    for name in sorted(oracle):
        try:
            want_raw = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got_raw = pd.concat([pd.read_parquet(f) for f in files])
        got, want = norm(got_raw), norm(want_raw)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns got={list(got.columns)} want={list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows got={len(got)} want={len(want)}")
            n_fail += 1
            continue
        bad = cells_equal(got, want)
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
            continue
        if ordered:
            obad = cells_equal(norm_ordered(got_raw), norm_ordered(want_raw))
            if obad:
                print(f"ORDER-FAIL {name}: multiset matches but emitted row "
                      f"order diverges (driver hash would be red): " + "; ".join(obad))
                n_order += 1
                continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    tail = f" / {n_order} order-fail" if ordered else ""
    print(f"== {n_pass} pass / {n_fail} fail{tail} ==")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], "--ordered" in sys.argv[3:])
