"""Testdata catalog: load the driver's parquet tables as DataFrames.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under ``/root/testdata/sf{0.001,0.01,0.1}/``.

Parquet scans here are the engine's hot path: Catalyst pushes filters and
prunes columns into these scans, so every query should express selection
declaratively rather than materializing full tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    cannot represent; with ``spark.sql.legacy.parquet.nanosAsLong`` the
    scan yields nanos-since-epoch longs, converted here to a microsecond
    timestamp by truncation — exactly what DuckDB's ns→µs read does, so
    oracle comparisons stay bit-identical.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All testdata tables keyed by name."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries work."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
