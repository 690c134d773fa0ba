#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same scale-factor tables and compare sorted rows/columns.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow as pa


def norm_type(t):
    """Normalize an arrow type the way the driver's comparer effectively
    does: integer width is benign (int32 vs int64 both land as int64 in
    pandas), timestamp unit/tz is benign. Everything else must match
    exactly — in particular DuckDB HUGEINT (decimal128) vs Spark BIGINT
    is a REAL driver failure and must fail here too."""
    if pa.types.is_integer(t) and t.bit_width <= 64:
        return "int"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


def schema_diff(o_schema, g_schema):
    """Return list of (col, oracle_type, spark_type) mismatches, plus any
    spark columns the driver's pandas comparer cannot sort (nested types)."""
    o_types = {f.name: f.type for f in o_schema}
    g_types = {f.name: f.type for f in g_schema}
    bad = []
    for name in o_types:
        if name not in g_types:
            continue  # column-set mismatch reported separately
        ot, gt = o_types[name], g_types[name]
        if norm_type(ot) != norm_type(gt):
            bad.append((name, str(ot), str(gt)))
    for name, gt in g_types.items():
        if pa.types.is_nested(gt):
            bad.append((name, "<unsortable-by-driver>", str(gt)))
    return bad

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # squash -0.0 and tiny representation noise at 9 significant digits
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        # fetch each side ONCE as arrow: rows and schema both derive from
        # it (re-running the heavy oracle SQL a second time just for the
        # schema doubled gate runtime)
        try:
            o_tbl = con.sql(sql).fetch_arrow_table()
            o_cols = o_tbl.column_names
            o_rows = [tuple(d[c] for c in o_cols) for d in o_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            g_tbl = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            g_cols = g_tbl.column_names
            g_rows = [tuple(d[c] for c in g_cols) for d in g_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(g_cols):
            print(f"FAIL {name}: columns oracle={sorted(o_cols)} spark={sorted(g_cols)}")
            n_fail += 1
            continue
        # dtype gate: the driver hash-compares typed values, so a value-level
        # match with a type-level mismatch (e.g. HUGEINT vs BIGINT) still
        # fails there — make it fail here first.
        mismatches = schema_diff(o_tbl.schema, g_tbl.schema)
        if mismatches:
            n_fail += 1
            for colname, ot, gt in mismatches:
                print(f"FAIL {name}: dtype[{colname}] oracle={ot} spark={gt}")
            continue
        oc2, orows = norm_rows(o_cols, o_rows)
        gc2, grows = norm_rows(g_cols, g_rows)
        if orows != grows:
            n_fail += 1
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(grows)}")
            shown = 0
            for i in range(max(len(orows), len(grows))):
                a = orows[i] if i < len(orows) else None
                b = grows[i] if i < len(grows) else None
                if a != b:
                    print(f"  [{i}] oracle={a}")
                    print(f"  [{i}]  spark={b}")
                    shown += 1
                    if shown >= 5:
                        break
        else:
            print(f"OK   {name} ({len(orows)} rows)")
    print(f"{'ALL OK' if n_fail == 0 else str(n_fail) + ' FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
