#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows compared as written —
both sides end in identical ORDER BY clauses).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json, math, subprocess, sys

import duckdb
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

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(r[i] for i in order) for r in rows]

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # exact — the whole point of the integer-domain policy
        return False
    return a == b

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_tbl = pq.read_table(f"{OUT}/{name}")
        s_cols = spark_tbl.column_names
        s_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        continue
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    s_cols, s_rows = canon(s_cols, s_rows)
    d_cols, d_rows = canon(d_cols, d_rows)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
        fails += 1
        continue
    if len(s_rows) != len(d_rows):
        print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
        fails += 1
        continue
    bad = None
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not all(cell_eq(a, b) for a, b in zip(sr, dr)):
            bad = (i, sr, dr)
            break
    if bad:
        i, sr, dr = bad
        print(f"FAIL {name}: row {i} differs\n  cols : {s_cols}\n  spark: {sr}\n  duck : {dr}")
        fails += 1
    else:
        print(f"OK   {name} ({len(s_rows)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
