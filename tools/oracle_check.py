#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir> [--ordered]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
the sfDir parquet tables registered as views, read the Spark result parquet,
sort columns by name + rows by all columns, and compare cell-by-cell
(exact; doubles also reported with max abs diff when not bit-equal).

TYPE PRE-FLIGHT (r9, after the r8 HUGEINT incident): before comparing
values, `DESCRIBE` the oracle SQL and compare every declared DuckDB output
type against the Spark parquet physical type. A declared HUGEINT/DECIMAL
(or any type the driver's hasher renders differently from the parquet
type — e.g. HUGEINT materializes as float64 in pandas, so int64 `40`
hashes against `40.0`) is a TYPE-FAIL even when the float-coerced values
compare equal. This is exactly the class that was green locally and red
on the driver for three rounds (q95/q104/q211/q287/q297).

The one allowed relaxation: a column DECLARED as an integer type in DuckDB
may *fetch* as float64 when the result contains NULLs (pandas NULL
promotion — q85 session_id, q182 first_cut_idx are this shape and pass the
driver, which canonicalizes missing values). Declared-type drift is a bug;
fetch-time NaN promotion of a correctly-declared column is not.

--ordered additionally compares rows in EMITTED order (Spark's coalesce(1)
parquet read top-to-bottom vs DuckDB's ORDER BY order) — the driver's hash
is row-order sensitive, so a query whose multiset matches but whose null
keys sort NULLS FIRST in Spark / NULLS LAST in DuckDB is red on the driver
yet green in the sorted compare. Such queries report ORDER-FAIL.
"""
import json, sys, glob, re
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB declared type -> acceptable pyarrow physical type prefixes.
# Anything not in this map (HUGEINT, UHUGEINT, DECIMAL, UUID, ...) has no
# faithful int64/float64 pandas materialization => always a TYPE-FAIL.
DUCK_TO_ARROW = {
    "BIGINT": ("int64",),
    "INTEGER": ("int32", "int64"),
    "SMALLINT": ("int16", "int32", "int64"),
    "TINYINT": ("int8", "int16", "int32", "int64"),
    "UBIGINT": ("uint64",),
    "DOUBLE": ("double",),
    "FLOAT": ("float", "double"),
    "REAL": ("float", "double"),
    "VARCHAR": ("string", "large_string"),
    "DATE": ("date32",),
    "TIMESTAMP": ("timestamp",),
    "TIMESTAMP_NS": ("timestamp",),
    "TIMESTAMP WITH TIME ZONE": ("timestamp",),
    "BOOLEAN": ("bool",),
    "BLOB": ("binary", "large_binary"),
}
INT_DECLS = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT"}


def duck_decl_types(con, sql):
    """{column -> declared DuckDB type} via DESCRIBE (no execution)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def type_preflight(decl, arrow_schema):
    """Compare declared DuckDB types to the Spark parquet physical schema.

    Returns a list of human-readable violations (empty = clean).
    """
    bad = []
    arrow = {f.name: str(f.type) for f in arrow_schema}
    for col, dt in decl.items():
        base = dt.split("(")[0].strip().upper()
        if base.endswith("[]") or base.startswith("STRUCT") or base.startswith("MAP") \
                or base.startswith("LIST"):
            continue  # nested: the value compare handles these; no scalar hash drift
        if base in ("HUGEINT", "UHUGEINT") or base.startswith("DECIMAL"):
            bad.append(f"{col}: declared {dt} (no faithful pandas int — "
                       f"driver hashes it as float); CAST it in the oracle SQL")
            continue
        at = arrow.get(col)
        if at is None:
            continue  # column-set mismatch reported separately
        ok_prefixes = DUCK_TO_ARROW.get(base)
        if ok_prefixes is None:
            bad.append(f"{col}: declared {dt} has no mapping to parquet type {at}")
        elif not any(at.startswith(p) for p in ok_prefixes):
            bad.append(f"{col}: declared {dt} vs parquet {at}")
    return bad


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def norm_ordered(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)

def cells_equal(got: pd.DataFrame, want: pd.DataFrame, decl=None):
    """Cell compare. `decl` = declared DuckDB types; with it, float
    coercion of an int column is ONLY allowed when the declaration is an
    integer type (NaN promotion), never silently."""
    bad = []
    decl = decl or {}
    for c in got.columns:
        g, w = got[c].values, want[c].values
        g_f, w_f = g.dtype.kind == 'f', w.dtype.kind == 'f'
        g_i, w_i = g.dtype.kind in 'iu', w.dtype.kind in 'iu'
        base = decl.get(c, "").split("(")[0].strip().upper()
        # int-on-one-side / float-on-the-other: legal only via NULL
        # promotion of a declared-integer oracle column
        if (g_i and w_f) or (g_f and w_i):
            if base and base not in INT_DECLS and not g_f:
                bad.append(f"{c}: dtype drift got={g.dtype} want={w.dtype} "
                           f"(declared {decl.get(c)}) — cast the oracle column")
                continue
            wf_nonnan = w.astype(float) if w_f else w
            if w_f and not np.all(np.isnan(wf_nonnan) |
                                  (wf_nonnan == np.floor(wf_nonnan))):
                bad.append(f"{c}: oracle float64 holds non-integral values "
                           f"against Spark {g.dtype}")
                continue
        if g_f or w_f:
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
    n_pass = n_fail = n_order = n_type = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            decl = duck_decl_types(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {e}")
            n_fail += 1
            continue
        tbad = type_preflight(decl, pq.read_schema(files[0]))
        if tbad:
            print(f"TYPE-FAIL {name}: " + "; ".join(tbad))
            n_type += 1
            n_fail += 1
            continue
        try:
            want_raw = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
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
        bad = cells_equal(got, want, decl)
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
            continue
        if ordered:
            obad = cells_equal(norm_ordered(got_raw), norm_ordered(want_raw), decl)
            if obad:
                print(f"ORDER-FAIL {name}: multiset matches but emitted row "
                      f"order diverges (driver hash would be red): " + "; ".join(obad))
                n_order += 1
                continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    tail = f" / {n_order} order-fail" if ordered else ""
    ttail = f" ({n_type} type-fail)" if n_type else ""
    print(f"== {n_pass} pass / {n_fail} fail{ttail}{tail} ==")
    return 1 if (n_fail or n_order) else 0

if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: oracle_check.py <sfDir> <verifyOutDir> [--ordered]",
              file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2], "--ordered" in sys.argv[3:]))
