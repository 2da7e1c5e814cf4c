#!/usr/bin/env python3
"""Build a RATIOS_r*.json ledger: per-query Spark bench seconds vs the
DuckDB oracle replay (validation tooling, not part of the shipped
library). Mirrors tools/time_oracle.py's measurement: DuckDB 32 threads
over the same sf parquet tables, min of N warm reps.

Usage:
  python3 tools/build_ratios.py <sfDir> <oracle_sql.json> \
      <bench_times.json>[,<bench_times2.json>...] <out.json> [note]

Spark seconds = per-query MIN across the supplied bench_times files
(the rerun-min protocol). Oracle failures are recorded, not fatal.
"""
import sys, json, time
import duckdb

sf, oracle_path, bench_paths, out_path = sys.argv[1:5]
note = sys.argv[5] if len(sys.argv) > 5 else ""

benches = []
for p in bench_paths.split(","):
    d = json.load(open(p))
    benches.append(d.get("queries", d))
spark = {}
for b in benches:
    for k, v in b.items():
        spark[k] = min(spark.get(k, 1e18), v)

oracle = json.load(open(oracle_path))
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

queries, errors = {}, {}
for n in sorted(spark):
    if n not in oracle:
        continue
    ts = []
    try:
        for _ in range(2):
            t0 = time.time()
            con.execute(oracle[n]).fetchall()
            ts.append(time.time() - t0)
    except Exception as e:
        errors[n] = str(e)[:200]
        continue
    d = min(ts)
    queries[n] = {"spark_s": round(spark[n], 3), "duckdb_s": round(d, 3),
                  "ratio": round(spark[n] / d, 2) if d > 0 else None}

out = {"note": note, "sf": sf, "queries": queries, "oracle_errors": errors}
json.dump(out, open(out_path, "w"), indent=1)
tot_s = sum(v["spark_s"] for v in queries.values())
tot_d = sum(v["duckdb_s"] for v in queries.values())
print(f"wrote {out_path}: {len(queries)} queries, {len(errors)} oracle "
      f"errors; spark {tot_s:.1f}s vs duckdb {tot_d:.1f}s "
      f"(aggregate {tot_s / tot_d:.2f}x)")
