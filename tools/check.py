#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare the way the driver does — both sides loaded into
pandas, columns sorted by name, rows sorted via DataFrame.sort_values over
ALL columns (this is where unsortable cells — arrays, maps — blow up, so
they must blow up HERE first), dtypes required to match (a NULL-bearing
int64 arriving as float64 on one side only is a real driver hash
mismatch), then exact elementwise equality (NaN == NaN).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json, subprocess, sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SFDIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail)
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def canon(df):
    """Driver-style canonicalization: columns sorted by name, then rows
    sorted over all columns. Raises (like the driver) on unsortable
    cells — callers treat that as a FAIL, not an excuse."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def cell_eq(a, b):
    if a is None or b is None or a is pd.NA or b is pd.NA:
        return (a is None or a is pd.NA) and (b is None or b is pd.NA)
    fa, fb = isinstance(a, (float, np.floating)), isinstance(b, (float, np.floating))
    if fa or fb:
        if not (fa and fb):
            return False
        if np.isnan(a) and np.isnan(b):
            return True
        return a == b  # exact — the whole point of the integer-domain policy
    return a == b


fails = 0
for name, sql in sorted(oracle.items()):
    try:
        s_df = pq.read_table(f"{OUT}/{name}").to_pandas()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        continue
    try:
        d_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    if sorted(s_df.columns) != sorted(d_df.columns):
        print(f"FAIL {name}: columns spark={sorted(s_df.columns)} duck={sorted(d_df.columns)}")
        fails += 1
        continue
    if len(s_df) != len(d_df):
        print(f"FAIL {name}: rows spark={len(s_df)} duck={len(d_df)}")
        fails += 1
        continue
    try:
        s_df = canon(s_df)
    except Exception as e:
        print(f"FAIL {name}: spark rows unsortable (driver would err): {type(e).__name__}: {e}")
        fails += 1
        continue
    try:
        d_df = canon(d_df)
    except Exception as e:
        print(f"FAIL {name}: oracle rows unsortable (driver would err): {type(e).__name__}: {e}")
        fails += 1
        continue
    dt_bad = [c for c in s_df.columns if s_df[c].dtype != d_df[c].dtype]
    if dt_bad:
        det = {c: (str(s_df[c].dtype), str(d_df[c].dtype)) for c in dt_bad}
        print(f"FAIL {name}: dtype mismatch (driver hash would differ): {det}")
        fails += 1
        continue
    bad = None
    s_rows = [tuple(r) for r in s_df.itertuples(index=False, name=None)]
    d_rows = [tuple(r) for r in d_df.itertuples(index=False, name=None)]
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not all(cell_eq(a, b) for a, b in zip(sr, dr)):
            bad = (i, sr, dr)
            break
    if bad:
        i, sr, dr = bad
        print(f"FAIL {name}: row {i} differs\n  cols : {list(s_df.columns)}\n  spark: {sr}\n  duck : {dr}")
        fails += 1
    else:
        print(f"OK   {name} ({len(s_rows)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
