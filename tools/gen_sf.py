#!/usr/bin/env python3
"""Deterministic scale-up of a testdata SF directory (dev tooling, like
check.py — runs driver-side python, never inside the Spark library).

Replicates every scaling table `factor`× with a per-copy key offset of
1e9 × copy-index on primary AND foreign keys, so referential integrity is
preserved copy-by-copy while key cardinality (users, orders, docs, vectors)
grows with volume — the way a real corpus grows. Timestamps, dates, text,
and embeddings pass through unchanged, so date-window predicates and
value distributions keep their selectivity. region/nation stay fixed
(TPC-H semantics: dims don't scale).

Usage: python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import os
import sys

import duckdb

OFF = 10 ** 9

# key columns to offset per table; tables absent here copy through as-is
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        src_pq = f"{src}/{t}.parquet"
        dst_pq = f"{dst}/{t}.parquet"
        if t not in KEYS or factor == 1:
            con.execute(f"COPY (SELECT * FROM read_parquet('{src_pq}')) "
                        f"TO '{dst_pq}' (FORMAT PARQUET)")
        else:
            repl = ", ".join(f"{k} + r.i * {OFF} AS {k}" for k in KEYS[t])
            con.execute(
                f"COPY (SELECT t.* REPLACE ({repl}) "
                f"FROM read_parquet('{src_pq}') t "
                f"CROSS JOIN (SELECT range AS i FROM range({factor})) r) "
                f"TO '{dst_pq}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_pq}')").fetchone()[0]
        print(f"[gen_sf] {t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
