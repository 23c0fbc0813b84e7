#!/usr/bin/env python3
"""Determinism gate (dev tool): diff two Verify output dirs value-wise.
For each query dir present in both, EXCEPT ALL in both directions via
DuckDB — zero rows each way = value-identical outputs.

Usage: python3 tools/determinism.py <verifyDirA> <verifyDirB>
"""
import sys, os
import duckdb

def main(a, b):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d))
                   and os.path.isdir(os.path.join(b, d)))
    bad = []
    for n in names:
        qa = f"SELECT * FROM '{a}/{n}/*.parquet'"
        qb = f"SELECT * FROM '{b}/{n}/*.parquet'"
        try:
            d1 = con.sql(f"SELECT count(*) FROM (({qa}) EXCEPT ALL ({qb}))").fetchone()[0]
            d2 = con.sql(f"SELECT count(*) FROM (({qb}) EXCEPT ALL ({qa}))").fetchone()[0]
            if d1 or d2:
                bad.append((n, d1, d2))
                print(f"XX {n}: {d1} rows only in A, {d2} only in B")
        except Exception as e:
            bad.append((n, -1, -1))
            print(f"XX {n}: {e}")
    print(f"{len(names) - len(bad)}/{len(names)} value-identical, {len(bad)} diffs")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
