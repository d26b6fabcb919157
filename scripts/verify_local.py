#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/verify_local.py [sfDir] [outDir]

Runs nothing Spark-side itself -- expects `sbt "runMain graft.Verify <sfDir>
<outDir>"` to have produced <outDir>/<query>/ parquet dirs plus
oracle_sql.json. For each query: registers the sf tables as DuckDB views,
runs the oracle SQL, loads the Spark parquet, sorts columns by name, and
compares row-by-row (floats with exact equality first, then 1e-9 rel
fallback reported separately).

Dev tooling only -- not part of the library (driver-side python is allowed
for verification per the environment notes).
"""
import json, sys, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                same = (a.astype(str).values == b.astype(str).values).all()
            except Exception:
                same = False
            if not same:
                diffs = (a.astype(str).values != b.astype(str).values).sum()
                print(f"FAIL {name}: col {c} differs in {diffs} rows")
                print("  got:", a[a.astype(str).values != b.astype(str).values].head(3).tolist())
                print("  exp:", b[a.astype(str).values != b.astype(str).values].head(3).tolist())
                ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
