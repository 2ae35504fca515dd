"""SQL entry point (SURVEY.md §3.4): the engine's queries are DataFrame
plans, but the SQL surface is first-class — spark.sql() over the
catalog's registered views compiles to the same Catalyst plan space.
One representative multi-join/agg query (TPC-H Q3 shape) proves the
path end-to-end against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from local_etl_spark.catalog import register_views
from local_etl_spark.registry import query

_Q3 = """
SELECT l_orderkey,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query("sql_q3", family="sql", oracle=_Q3)
def sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) through spark.sql — THE SAME SQL
    string is the DuckDB oracle, so the check is pure engine-vs-engine
    semantics on an identical query text. Catalyst still gets pushdown/
    broadcast decisions; the customer filter prunes at the scan."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3)


_LATERAL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
       t.o_totalprice, t.rank_in_cust
FROM customer c,
LATERAL (
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
               AS rank_in_cust
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
"""


@query("sql_lateral", family="sql", oracle=_LATERAL)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer), same
    SQL text in both engines. The naïve read is a per-customer
    re-execution; Catalyst decorrelates the LATERAL into a join +
    per-key window/limit — the plan a per-row loop would never
    survive at 100 TB. (topk_per_group is the DataFrame spelling of
    the same computation; this entry pins the SQL front door.)
    Ordering keys (o_totalprice DESC, o_orderkey) form a total order,
    so the LIMIT boundary is deterministic across engines."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL)


_RECURSIVE = """
WITH RECURSIVE months(m, hi) AS (
    SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP),
           CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP)
    FROM orders
    UNION ALL
    SELECT CAST(m + INTERVAL 1 MONTH AS TIMESTAMP), hi
    FROM months
    WHERE m < hi
)
SELECT m.m AS month_start,
       count(o.o_orderkey) AS n_orders
FROM months m
LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
GROUP BY m.m
"""


@query("sql_recursive", family="sql", oracle=_RECURSIVE)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): a calendar spine from
    min to max order month, LEFT-joined back so EMPTY months still
    appear with zero counts — time-series densification, the gap-fill
    every reporting pipeline needs and plain GROUP BY cannot produce.
    Same SQL text in both engines. The recursion materializes one row
    per month (bounded, driver-safe); the upper bound rides IN the
    anchor row ("hi") so each recursive step is a 1-row local
    computation — a correlated scalar subquery in the step predicate
    would re-scan orders EVERY iteration (measured: 20s vs 2s at
    sf0.1, ~80 iterations). The orders side remains one scan + one
    broadcast-able join on the truncated month."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE)
