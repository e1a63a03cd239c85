#!/usr/bin/env python3
"""Compare two Verify output dirs (parquet per query): schema + row-set hash.

Usage: cmp_outputs.py BASE_DIR NEW_DIR [query ...]
Mirrors the driver's compare semantics: columns sorted by name, rows sorted,
values hashed. Local dev tool only (runs on the driver-side python stack).
"""
import sys, os, hashlib
import duckdb

def table_hash(con, path):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM parquet_scan('{path}/*.parquet')").fetchall()]
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.execute(
        f"SELECT {sel} FROM parquet_scan('{path}/*.parquet') ORDER BY ALL").fetchall()
    h = hashlib.sha256()
    for row in rows:
        h.update(repr(row).encode())
    return sorted(cols), len(rows), h.hexdigest()

def main():
    base, new = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or sorted(
        set(os.listdir(base)) & set(os.listdir(new)) - {"oracle_sql.json"})
    con = duckdb.connect()
    bad = 0
    for n in names:
        if n == "oracle_sql.json":
            continue
        b = table_hash(con, os.path.join(base, n))
        v = table_hash(con, os.path.join(new, n))
        ok = b == v
        bad += 0 if ok else 1
        print(f"{'OK ' if ok else 'DIFF'} {n}: rows {b[1]}->{v[1]}"
              + ("" if ok else f" cols {b[0]} vs {v[0]} hash {b[2][:12]} vs {v[2][:12]}"))
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
