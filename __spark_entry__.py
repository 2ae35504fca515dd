"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``local_etl_spark.registry`` — the engine's declared
query inventory (SURVEY.md §2.4). The driver runs ``entry(spark)`` as a
smoke check, then each ``queries()[name]`` at sf=0.01 against the
matching ``oracle_sql()[name]`` via DuckDB.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from local_etl_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from local_etl_spark.queries.aggregates import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for rows-only checks)."""
    return registry.all_oracles()
