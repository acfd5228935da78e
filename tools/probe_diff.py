#!/usr/bin/env python3
"""Determinism probe compare: two graft.Verify output dirs, every query's
result column-sorted + row-sorted + value-compared (the same normalization
the oracle compare applies, so ordering differences inside a file don't
mask real value instability and don't false-positive on it either).

Usage: python3 tools/probe_diff.py /tmp/probe_a /tmp/probe_b
"""
import os
import sys

import duckdb

a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
qa = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
qb = sorted(d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d)))
if qa != qb:
    print(f"DIFF query sets: only-a={set(qa)-set(qb)} only-b={set(qb)-set(qa)}")
    sys.exit(1)
bad = []
for q in qa:
    da = con.execute(f"SELECT * FROM '{a}/{q}/*.parquet'").df()
    db = con.execute(f"SELECT * FROM '{b}/{q}/*.parquet'").df()
    da = da.reindex(sorted(da.columns), axis=1)
    db = db.reindex(sorted(db.columns), axis=1)
    if list(da.columns) != list(db.columns):
        bad.append(f"{q}: COLS {list(da.columns)} vs {list(db.columns)}")
        continue
    da = da.sort_values(list(da.columns)).reset_index(drop=True)
    db = db.sort_values(list(db.columns)).reset_index(drop=True)
    if len(da) != len(db):
        bad.append(f"{q}: ROWS {len(da)} vs {len(db)}")
        continue
    if not da.equals(db):
        bad.append(f"{q}: VALUES differ")
print(f"queries compared: {len(qa)}; diffs: {len(bad)}")
for line in bad:
    print(" ", line)
sys.exit(1 if bad else 0)
