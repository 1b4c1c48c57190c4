#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: tools/check.py [sfDir] [outDir] [queryFilter...]

Assumes `graft.Verify` already ran (tools/verify.sh does both). For every
entry in outDir/oracle_sql.json: run the SQL in DuckDB against the sfDir
parquet tables, load the Spark result parquet, sort columns by name, compare
row-by-row (exact; floats exact too, matching a hash-based compare).
"""
import duckdb, glob, json, math, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_ok = n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        n_fail += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        n_fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        n_fail += 1
        continue
    # The driver compare is hash-based, so value REPRESENTATION matters:
    # DuckDB sum(BIGINT) returns HUGEINT (int128) which hashes differently
    # than Spark's int64 even when values are equal. Treat dtype drift as
    # failure so the local gate predicts the driver gate.
    dt_bad = [c for c in exp.columns if str(exp[c].dtype) != str(got[c].dtype)]
    if dt_bad:
        for c in dt_bad[:5]:
            print(f"  {name}.{c}: dtype exp={exp[c].dtype} got={got[c].dtype}")
        print(f"FAIL {name}: {len(dt_bad)} dtype mismatches (driver hash would differ)")
        n_fail += 1
        continue
    # row order is explicit (ORDER BY both sides); compare positionally
    bad = 0
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            isna = lambda x: x is None or (isinstance(x, float) and math.isnan(x))
            if isna(a) and isna(b):
                continue
            if a != b:
                if bad < 3:
                    print(f"  {name}.{c}[{i}]: exp={a!r} got={b!r}")
                bad += 1
    if bad:
        print(f"FAIL {name}: {bad} value mismatches")
        n_fail += 1
    else:
        print(f"ok   {name} ({len(exp)} rows)")
        n_ok += 1
print(f"== {n_ok} ok, {n_fail} fail")
sys.exit(1 if n_fail else 0)
