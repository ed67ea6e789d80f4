#!/usr/bin/env python3
"""Dev-loop oracle parity check (front-runs the driver's DuckDB compare).

Usage: parity.py <sfdir> <verify_outdir> [query ...]

Reproduces the DRIVER'S ingestion paths exactly (ADVICE r02):
  - Spark side: pandas.read_parquet of the Verify output — parquet DECIMAL
    columns stay scale-preserving decimal.Decimal objects ('138014.00').
  - Oracle side: duckdb .df() — DECIMAL results become float64 ('138014.0').
Then sorts columns by name, sorts rows by all columns (the driver's
sort_values — this is also what crashes on list/ndarray cells, so that
crash reproduces here too), and compares the RENDERED (str) cell values.
Any divergence the driver would hash-fail shows up as a cell diff here.
Exit 1 on any mismatch.
"""
import duckdb, json, glob, os, sys
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for f in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def render(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df.astype(str)

n_pass = n_fail = 0
missing = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_glob = glob.glob(os.path.join(out, name, "*.parquet"))
    if not spark_glob:
        missing.append(name)
        continue
    errs = []
    try:
        sdf = pd.read_parquet(spark_glob[0])          # driver path: pyarrow
        odf = con.execute(oracle[name]).df()          # driver path: duckdb .df()
        if sorted(sdf.columns) != sorted(odf.columns):
            errs.append(f"column names differ: spark={sorted(sdf.columns)} "
                        f"oracle={sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            errs.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        else:
            sr, orr = render(sdf), render(odf)
            # dtype drift is what made round-2 decimals render apart — surface it
            for c in sr.columns:
                if str(sdf[c].dtype) != str(odf[c].dtype):
                    errs.append(f"dtype of {c}: spark={sdf[c].dtype} "
                                f"oracle={odf[c].dtype}")
            neq = (sr != orr)
            if neq.any().any():
                for c in sr.columns:
                    bad = neq[c]
                    if bad.any():
                        i = int(bad.idxmax())
                        errs.append(f"row {i} col {c}: spark={sr[c][i]!r} "
                                    f"oracle={orr[c][i]!r} "
                                    f"({int(bad.sum())} cells differ)")
            errs = errs[:6]
    except Exception as e:
        errs.append(f"driver-path crash: {type(e).__name__}: {e}")
    if errs:
        n_fail += 1
        print(f"FAIL {name}")
        for e in errs:
            print(f"     {e}")
    else:
        n_pass += 1
        print(f"ok   {name} ({len(sdf)} rows)")

if missing:
    print(f"missing spark output (declared in oracle_sql.json): {missing}")
print(f"== {n_pass} pass, {n_fail} fail, {len(missing)} missing ==")
sys.exit(1 if (n_fail or missing) else 0)
