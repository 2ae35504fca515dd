"""Filter / projection queries (SURVEY.md §2.4-C).

Filters here are expressed declaratively so Catalyst pushes them into
the parquet scan (visible as PushedFilters in explain()); projections
prune the read schema. tests/test_plans.py asserts both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.queries._util import DEC6, dec, t
from local_etl_spark.registry import query


@query(
    "filter_pred",
    family="filters",
    oracle="""
SELECT o_orderkey AS orderkey, o_orderstatus AS status,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       o_orderpriority AS priority
FROM orders
WHERE (o_totalprice BETWEEN 100000 AND 300000)
  AND o_orderstatus IN ('O', 'F')
  AND o_orderpriority LIKE '%URGENT'
  AND o_orderdate IS NOT NULL
  AND NOT (o_custkey = 0)
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: BETWEEN, IN, LIKE, null-check, negation —
    all pushed to the scan by Catalyst."""
    o = t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_totalprice").between(100000, 300000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("%URGENT")
        & F.col("o_orderdate").isNotNull()
        & ~(F.col("o_custkey") == 0)
    ).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderpriority").alias("priority"),
    )


@query(
    "project_expr",
    family="filters",
    oracle="""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,6))
            * CAST(1 - CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))
            AS DOUBLE) AS net_price,
       CAST(l_quantity * 2 AS DOUBLE) AS double_qty,
       CASE WHEN l_quantity > 40 THEN 'bulk'
            WHEN l_quantity > 10 THEN 'mid'
            ELSE 'small' END AS qty_class,
       l_linenumber % 2 = 0 AS even_line
FROM lineitem
WHERE l_returnflag = 'A'
""",
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with arithmetic, CASE WHEN, boolean derivation and
    aliasing; decimal product keeps net_price bit-stable cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount")).cast(DEC6))
        .cast("double")
        .alias("net_price"),
        (F.col("l_quantity") * 2).alias("double_qty"),
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
        (F.col("l_linenumber") % 2 == 0).alias("even_line"),
    )
