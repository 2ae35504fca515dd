"""Shared helpers for query modules.

Determinism policy for the DuckDB oracle (see registry.py docstring):
money math runs in exact DECIMAL(18,6) and is cast to DOUBLE only at the
very end. The testdata doubles are 2-decimal-generated, so the
double→decimal(18,6) cast is an exact recovery on both engines; decimal
addition is associative, so partition-order differences between Spark and
DuckDB cannot change a single bit of the result.

Decimal precision discipline: every multiplication operand is first cast
to DECIMAL(18,6) so products stay at precision 37 ≤ 38 — above 38 Spark
silently rounds, which would break engine parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.catalog import table

DEC6 = "decimal(18,6)"


def dec(c: str | Column) -> Column:
    """Exact decimal view of a 2dp-generated double column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC6)


def dsum(c: Column) -> Column:
    """Exact decimal sum emitted as DOUBLE (deterministic across engines).

    The intermediate DECIMAL(28,6) squeeze matters: DuckDB's
    decimal→double cast divides an int128 by 10^scale in floating point,
    which double-rounds at scale 12; at scale 6 the conversion is exact
    for |value| < 2^53/10^6 ≈ 9e9, so both engines emit identical bits.
    Oracle form: ``CAST(CAST(sum(...) AS DECIMAL(28,6)) AS DOUBLE)``.
    """
    return F.sum(c).cast("decimal(28,6)").cast("double")


def davg(c: Column) -> Column:
    """avg = exact-decimal sum cast to double, divided by count.

    Plain ``avg(double)`` is summation-order-dependent; this form is not.
    Oracle: ``CAST(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DECIMAL(28,6))
    AS DOUBLE) / count(x)``.
    """
    return F.sum(c).cast("decimal(28,6)").cast("double") / F.count(c)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand testdata table loader."""
    return table(spark, sf_dir, name)
