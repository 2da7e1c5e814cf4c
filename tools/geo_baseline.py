#!/usr/bin/env python3
"""Time the DuckDB G-query oracle at bench scale (NOT part of the shipped
library — validation tooling only).

Usage: python3 tools/geo_baseline.py [target/geo_oracle_sql.json] [threads]

graft.Bench writes target/geo_oracle_sql.json when it runs against the
scaled geo fixture (sf0.1): the same oracle SQL the correctness gate uses,
bound to the 10k-street / 100k-point fixture dir. This script runs each
query in DuckDB and prints one JSON line of per-query seconds — the
same-scale baseline for the g01-g03 bench entries.
"""
import sys, json, time
import duckdb

def main(path, threads):
    sql = json.load(open(path))
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    out = {}
    for name in sorted(sql):
        t0 = time.time()
        n = len(con.execute(sql[name]).fetchall())
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]} s ({n} rows)", file=sys.stderr)
    print(json.dumps({"metric": "geo_baseline", "unit": "sec",
                      "threads": threads, "queries": out,
                      "total": round(sum(out.values()), 3)}))

if __name__ == "__main__":
    p = sys.argv[1] if len(sys.argv) > 1 else "target/geo_oracle_sql.json"
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(p, t)
