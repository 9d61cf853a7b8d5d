#!/usr/bin/env python3
"""Regression test for the type-strict oracle gate (VERDICT r8 #2).

Pins the r8 HUGEINT incident: an oracle whose output column is an uncast
DuckDB `sum()`/`//` result declares HUGEINT, pandas materializes it as
float64, and the driver's row hash reds even though every value matches.
The local gate must flag that BEFORE values are compared.

Run: python3 tools/test_type_gate.py   (exit 0 = gate healthy)
"""
import sys

import duckdb

from oracle_check import duck_decl_types, type_preflight


class _F:  # minimal stand-in for a pyarrow schema field
    def __init__(self, name, typ):
        self.name, self.type = name, typ


def main() -> int:
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 'a'), (2, 'a'), (3, 'b')) v(n, k)")

    # the r8 red shape: integer window-sum arithmetic with `//`, uncast
    # (q95 prob_bp / q104 share_bp / q287 hapax_bp / q297 recall_bp)
    pre_fix = ("SELECT k, (20000 * n + sum(n) OVER (PARTITION BY k))"
               " // (2 * sum(n) OVER (PARTITION BY k)) AS bp FROM t")
    post_fix = ("SELECT k, CAST((20000 * n + sum(n) OVER (PARTITION BY k))"
                " // (2 * sum(n) OVER (PARTITION BY k)) AS BIGINT) AS bp FROM t")
    spark_schema = [_F("k", "string"), _F("bp", "int64")]

    decl = duck_decl_types(con, pre_fix)
    assert decl["bp"] == "HUGEINT", f"DuckDB changed promotion rules? got {decl['bp']}"
    bad = type_preflight(decl, spark_schema)
    assert bad and "bp" in bad[0], f"gate MISSED the HUGEINT class: {bad}"

    decl2 = duck_decl_types(con, post_fix)
    assert decl2["bp"] == "BIGINT", decl2
    assert type_preflight(decl2, spark_schema) == []

    # the q211 shape: least(4, huge // huge + 1) also promotes
    seg = "SELECT least(4, (4 * sum(n) OVER ()) // (sum(n) OVER ()) + 1) AS sg FROM t"
    assert type_preflight(duck_decl_types(con, seg), [_F("sg", "int64")])

    # declared-BIGINT drift against a non-int parquet type must also flag
    assert type_preflight({"x": "BIGINT"}, [_F("x", "double")])
    # ...but declared BIGINT vs parquet int64 is clean (NaN promotion at
    # fetch time is the driver-canonicalized q85/q182 shape, not a bug)
    assert type_preflight({"x": "BIGINT"}, [_F("x", "int64")]) == []

    print("type-gate regression: all assertions pass "
          "(pre-fix HUGEINT flagged, post-fix clean, drift flagged)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
