"""Optimization-round measurement harness (guide §1).

For each named query: run it with the BENCH methodology (build the
DataFrame, .count(), best-of-N) so numbers are directly comparable to
bench.py entries, and optionally dump .explain("formatted") of the
returned plan to plans/<tag>/<name>_<suffix>.txt.

Usage:
  python tools_opt_measure.py [--reps N] [--plans SUFFIX] [--sf DIR] name ...

Notes:
  - jobs are labelled via setJobDescription for UI readability;
  - the returned plan only covers the post-checkpoint tail for
    iterative queries — their loop cost is still captured by the
    wall-clock number, which times the whole fn (bench parity).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

args = sys.argv[1:]
reps = 2
plan_suffix = None
plan_round = "r14"
sf_dir = "/root/testdata/sf0.1"
names = []
i = 0
while i < len(args):
    if args[i] == "--reps":
        reps = int(args[i + 1]); i += 2
    elif args[i] == "--plans":
        plan_suffix = args[i + 1]; i += 2
    elif args[i] == "--plandir":
        plan_round = args[i + 1]; i += 2
    elif args[i] == "--sf":
        sf_dir = args[i + 1]; i += 2
    else:
        names.append(args[i]); i += 1

from local_etl_spark.registry import all_queries  # noqa: E402
from local_etl_spark.session import get_spark  # noqa: E402
from local_etl_spark.catalog import TABLES, table  # noqa: E402

import time as _t
_s = 0
_t0 = _t.perf_counter()
for _i in range(10_000_000):
    _s += _i
print(f"calib_st_miter_s: {10.0 / (_t.perf_counter() - _t0):.1f}", flush=True)

spark = get_spark("opt-measure")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

for name in TABLES:  # warm page cache + JVM, bench parity
    table(spark, sf_dir, name).count()

plans_dir = REPO / "plans" / plan_round
plans_dir.mkdir(parents=True, exist_ok=True)

for name in names:
    if name not in qs:
        print(f"{name}: NOT IN REGISTRY", flush=True)
        continue
    best = float("inf")
    df = None
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{r}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{name}: {best:.3f}s (best of {reps})", flush=True)
    if plan_suffix and df is not None:
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (plans_dir / f"{name}_{plan_suffix}.txt").write_text(txt)
