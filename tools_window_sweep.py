"""Sweep: list every registered query whose physical plan has an
unpartitioned Window / WindowGroupLimit node (corpus-sized single-task
sort at scale). The blanket rule lives in tests/test_plan_audit.py;
this tool prints the offenders with a snippet of the window spec."""

from __future__ import annotations

import sys

from local_etl_spark import registry
from local_etl_spark.plancheck import formatted_plan, unpartitioned_windows
from local_etl_spark.session import get_spark


def main() -> int:
    spark = get_spark(cpus=8)
    registry._load_all_modules()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    for name, spec in sorted(registry.REGISTRY.items()):
        try:
            plan = formatted_plan(spec.fn(spark, sf))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}"[:160])
            continue
        hits = unpartitioned_windows(plan)
        if hits:
            print(f"{name}: {hits}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
