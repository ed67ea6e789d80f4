#!/usr/bin/env python3
"""Dev-loop oracle parity check (front-runs the driver's DuckDB compare).

Usage: parity.py <sfdir> <verify_outdir> [query ...]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same source tables, and
diffs values cell-by-cell after sorting columns by name (mimicking the
driver's hash compare). Exit 1 on any mismatch.
"""
import duckdb, json, glob, os, sys, math
from decimal import Decimal

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for f in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def cells_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, Decimal): a = float(a)
        if isinstance(b, Decimal): b = float(b)
        if math.isnan(a) and math.isnan(b): return True
        return a == b  # exact: engines must agree bit-for-bit per D2/D3
    return a == b

n_pass = n_fail = 0
missing = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_glob = glob.glob(os.path.join(out, name, "*.parquet"))
    if not spark_glob:
        missing.append(name)
        continue
    sql = oracle[name]
    # Logical types matter: the driver's hash failed 7 round-1 queries whose
    # values were identical but whose decimal widths differed (ADVICE r01) —
    # compare DuckDB's view of both schemas, not just values.
    stypes = dict(
        (r[0], r[1]) for r in
        con.execute(f"DESCRIBE SELECT * FROM read_parquet('{spark_glob[0]}')").fetchall())
    otypes = dict((r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall())
    srel = con.execute(f"SELECT * FROM read_parquet('{spark_glob[0]}')")
    scols = [d[0] for d in srel.description]
    srows = srel.fetchall()
    orel = con.execute(sql)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    errs = []
    for c in sorted(set(stypes) & set(otypes)):
        if stypes[c] != otypes[c]:
            errs.append(f"type of {c} differs: spark={stypes[c]} oracle={otypes[c]}")
    if sorted(scols) != sorted(ocols):
        errs.append(f"column names differ: spark={sorted(scols)} oracle={sorted(ocols)}")
    elif len(srows) != len(orows):
        errs.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    else:
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        for i, (sr, orow) in enumerate(zip(srows, orows)):
            for si, oi in zip(sidx, oidx):
                if not cells_eq(sr[si], orow[oi]):
                    errs.append(
                        f"row {i} col {scols[si]}: spark={sr[si]!r} oracle={orow[oi]!r}")
                    if len(errs) >= 5: break
            if len(errs) >= 5: break
    if errs:
        n_fail += 1
        print(f"FAIL {name}")
        for e in errs:
            print(f"     {e}")
    else:
        n_pass += 1
        print(f"ok   {name} ({len(srows)} rows)")

if missing:
    print(f"missing spark output (declared in oracle_sql.json): {missing}")
print(f"== {n_pass} pass, {n_fail} fail, {len(missing)} missing ==")
sys.exit(1 if (n_fail or missing) else 0)
