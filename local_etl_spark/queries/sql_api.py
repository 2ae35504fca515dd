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
