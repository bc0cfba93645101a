#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify output parquet against its DuckDB oracle on the raw tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING OUTPUT {name}"); fail += 1; continue
    # read engine output with pandas/pyarrow (NOT duckdb): preserves
    # decimal columns as Decimal objects the way the driver's hasher
    # sees them — a decimal(28,2) "1524135.00" vs float "1524135.0"
    # mismatch only shows up this way
    import pandas as pd
    got = pd.read_parquet(files[0])
    try:
        want = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE ERROR {name}: {e}"); fail += 1; continue
    # driver sorts columns by name before hashing
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA MISMATCH {name}: {list(got.columns)} vs {list(want.columns)}")
        fail += 1; continue
    if len(got) != len(want):
        print(f"ROWS MISMATCH {name}: {len(got)} vs {len(want)}")
        fail += 1; continue
    # exact value compare (row order as produced)
    g = got.astype(str).values.tolist()
    w = want.astype(str).values.tolist()
    if g != w:
        # row-order-insensitive fallback check
        if sorted(map(tuple, g)) == sorted(map(tuple, w)):
            print(f"ORDER-ONLY MISMATCH {name} (values equal unordered)")
            fail += 1
        else:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"VALUE MISMATCH {name}: {len([1 for a,b in zip(g,w) if a!=b])} rows, e.g. {diffs}")
            fail += 1
        continue
    ok += 1
    print(f"OK {name} ({len(got)} rows)")
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
