"""Driver simulation: run every queries()[name] at sf0.01 and compare
with oracle_sql()[name] in DuckDB (row counts + sorted canonicalized
rows), mirroring the external driver's correctness gate.

Usage: python tools_driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

from local_etl_spark.session import get_spark
from tests.oracle import canon_rows, duck_connect

import __spark_entry__ as e

spark = get_spark()
qs, os_ = e.queries(), e.oracle_sql()

df = e.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema {[f.name for f in df.schema.fields]}", flush=True)

con = duck_connect(sf_dir)
fails = []
t0 = time.time()
for i, (name, fn) in enumerate(qs.items()):
    if only and name not in only:
        continue
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as ex:
        fails.append((name, f"spark error: {ex}"))
        print(f"[{i}] {name}: SPARK ERROR {ex}", flush=True)
        continue
    if name not in os_:
        print(f"[{i}] {name}: rows-only ({len(srows)} rows)", flush=True)
        continue
    try:
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as ex:
        fails.append((name, f"duck error: {ex}"))
        print(f"[{i}] {name}: DUCK ERROR {ex}", flush=True)
        continue
    if len(srows) != len(drows):
        fails.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
        print(f"[{i}] {name}: ROWCOUNT {len(srows)} vs {len(drows)}", flush=True)
        continue
    if sorted(scols) != sorted(dcols):
        fails.append((name, f"schema {sorted(scols)} vs {sorted(dcols)}"))
        print(f"[{i}] {name}: SCHEMA {sorted(scols)} vs {sorted(dcols)}", flush=True)
        continue
    if canon_rows(scols, srows) != canon_rows(dcols, drows):
        fails.append((name, "value mismatch"))
        print(f"[{i}] {name}: VALUE MISMATCH", flush=True)
        continue
    print(f"[{i}] {name}: ok ({len(srows)} rows)", flush=True)

print(f"\n{time.time()-t0:.1f}s total; {len(fails)} failures")
for name, why in fails:
    print(f"  FAIL {name}: {why}")
sys.exit(1 if fails else 0)
