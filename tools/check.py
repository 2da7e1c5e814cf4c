#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (NOT part of the
shipped library — validation tooling only).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
sf tables, and compares: column-name sets, row counts, and cell values
(columns sorted by name; rows compared in result order and as sorted
multiset). Prints PASS/FAIL per query.
"""
import sys, json, glob, math, decimal, datetime
import duckdb

def canon(v):
    if v is None:
        return r"\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"SKIP {name}: no spark output"); n_skip += 1; continue
        flist = "[" + ",".join(f"'{f}'" for f in files) + "]"
        sdesc = con.execute(f"DESCRIBE SELECT * FROM read_parquet({flist})").fetchall()
        scols = sorted(r[0] for r in sdesc)
        try:
            ores = con.execute(oracle[name])
            ocols_raw = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        ocols = sorted(ocols_raw)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); n_fail += 1; continue
        cols_sql = ", ".join(f'"{c}"' for c in scols)
        srows = con.execute(f"SELECT {cols_sql} FROM read_parquet({flist})").fetchall()
        operm = [ocols_raw.index(c) for c in scols]
        orows2 = [tuple(r[i] for i in operm) for r in orows]
        sc = [[canon(v) for v in r] for r in srows]
        oc = [[canon(v) for v in r] for r in orows2]
        if len(sc) != len(oc):
            print(f"FAIL {name}: rows spark={len(sc)} oracle={len(oc)}"); n_fail += 1; continue
        if sc == oc:
            # Type-strict gate: the driver compares schemas (r08 failed s22 on
            # TIMESTAMPTZ-vs-TIMESTAMP while values matched), so the local gate
            # must too. Both sides are DESCRIBE'd through DuckDB so the type
            # strings are directly comparable.
            otypes = {}
            try:
                od = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
                otypes = {r[0]: r[1] for r in od}
            except Exception as e:
                print(f"FAIL {name}: oracle DESCRIBE error: {e}"); n_fail += 1; continue
            stypes = {r[0]: r[1] for r in sdesc}
            tdiff = {c: (stypes.get(c), otypes.get(c)) for c in scols
                     if stypes.get(c) != otypes.get(c)}
            if tdiff:
                print(f"FAIL {name}: value-match but TYPE mismatch {tdiff}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(sc)} rows)"); n_pass += 1
        elif sorted(map(tuple, sc)) == sorted(map(tuple, oc)):
            print(f"WARN {name}: same multiset, different ORDER"); n_fail += 1
        else:
            bad = next(i for i in range(len(sc)) if sc[i] != oc[i])
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  cols : {scols}")
            print(f"  spark: {sc[bad]}")
            print(f"  duck : {oc[bad]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    return 1 if (n_fail or n_skip) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
