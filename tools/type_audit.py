#!/usr/bin/env python3
"""DESCRIBE-based type audit over the full oracle registry (VERDICT r8 #3).

Usage: type_audit.py <sfDir> <verifyOutDir>

For every query in <verifyOutDir>/oracle_sql.json, DESCRIBE the oracle SQL
in DuckDB (tables from <sfDir>) and cross-check every declared output type
against the Spark parquet physical schema in <verifyOutDir>/<name>/.

Classes flagged:
  HUGEINT   declared HUGEINT/UHUGEINT/DECIMAL — pandas materializes these
            as float64/object, the driver hash diverges from Spark int64
            even when values match (the r8 five-red class)
  DRIFT     declared type maps to a different parquet family than Spark
            wrote (e.g. DOUBLE vs int64, VARCHAR vs date32)
  UNMAPPED  declared type with no known parquet mapping (UUID, INTERVAL…)
  COLSET    oracle emits a column the Spark parquet lacks or vice versa

Exit code 1 if anything is flagged — wire into the CI sweep next to
oracle_check.py. NaN-promotion of declared-BIGINT nullable columns is NOT
flagged (declaration is the contract; fetch-time promotion is benign).
"""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq

from oracle_check import TABLES, DUCK_TO_ARROW, duck_decl_types


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    flagged = []
    for name in sorted(oracle):
        try:
            decl = duck_decl_types(con, oracle[name])
        except Exception as e:
            flagged.append((name, "DESCRIBE-ERR", str(e)[:120]))
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        arrow = {}
        if files:
            arrow = {f.name: str(f.type) for f in pq.read_schema(files[0])}
            dmiss = sorted(set(decl) - set(arrow))
            amiss = sorted(set(arrow) - set(decl))
            if dmiss or amiss:
                flagged.append((name, "COLSET",
                                f"oracle-only={dmiss} spark-only={amiss}"))
        for col, dt in decl.items():
            base = dt.split("(")[0].strip().upper()
            if base.endswith("[]") or base.startswith(("STRUCT", "MAP", "LIST")):
                continue
            if base in ("HUGEINT", "UHUGEINT") or base.startswith("DECIMAL"):
                flagged.append((name, "HUGEINT", f"{col}: {dt}"))
                continue
            ok = DUCK_TO_ARROW.get(base)
            at = arrow.get(col)
            if ok is None:
                flagged.append((name, "UNMAPPED", f"{col}: {dt}"))
            elif at is not None and not any(at.startswith(p) for p in ok):
                flagged.append((name, "DRIFT", f"{col}: declared {dt} vs parquet {at}"))
    if flagged:
        w = max(len(n) for n, _, _ in flagged)
        for n, cls, msg in flagged:
            print(f"{n:<{w}}  {cls:<9} {msg}")
        print(f"== {len(flagged)} flagged across "
              f"{len({n for n, _, _ in flagged})} queries ==")
        return 1
    print(f"== clean: {len(oracle)} oracles, zero type flags ==")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: type_audit.py <sfDir> <verifyOutDir>", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
