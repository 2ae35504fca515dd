"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query timing includes a full action (count of the result) so the
whole plan — scan, shuffle, agg — executes. A warm-up query runs first
so JVM/codegen startup isn't attributed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

HEADLINE = [
    "agg_groupby",
    "agg_global",
    "agg_rollup",
    "join_multiway",
    "join_broadcast",
    "win_rank",
    "topk_per_group",
    "llm_dedup_exact",
    "llm_simsearch",
    "llm_text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from local_etl_spark.registry import all_queries
    from local_etl_spark.session import get_spark

    spark = get_spark("local-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm-up: touch every table once so OS page cache + JVM are warm.
    from local_etl_spark.catalog import TABLES, table

    for name in TABLES:
        table(spark, sf_dir, name).count()

    timings: dict[str, float] = {}
    for name in names:
        start = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline-suite-total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
