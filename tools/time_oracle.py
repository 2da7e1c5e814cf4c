#!/usr/bin/env python3
"""Time the DuckDB oracle SQL for selected queries (validation tooling,
not part of the shipped library). Mirrors the judge's measurement:
DuckDB 32 threads over the same sf parquet tables, min of 3 runs.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> <name>...
"""
import sys, json, time
import duckdb

sf, oracle_path = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
oracle = json.load(open(oracle_path))
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
for n in names:
    if n not in oracle:
        print(f"{n}: no oracle sql")
        continue
    ts = []
    for _ in range(3):
        t0 = time.time()
        con.execute(oracle[n]).fetchall()
        ts.append(time.time() - t0)
    print(f"{n}: min={min(ts):.3f}s runs={[round(t, 3) for t in ts]}")
