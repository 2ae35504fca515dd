"""Advanced SQL front-door queries beyond the core TPC-H suite.

Same contract as sql_tpch.py: ONE dialect-neutral SQL text executed by
BOTH engines (spark.sql and the DuckDB oracle), so every check is pure
engine-vs-engine semantics on identical query text.

Contents:
  - ``sql_q1``   — the canonical TPC-H Q1 text (the pricing summary
    report; ``agg_groupby`` carries the same shape DataFrame-first, this
    is the faithful SQL-text version completing the TPC-H suite).
  - ``sql_q12a`` — TPC-H Q12 (shipping modes / order priority) restated
    on the available columns: the shipmode classes become ship-delay
    classes (testdata has no l_shipmode/l_commitdate/l_receiptdate).
  - ``sql_window_rollup`` — windows OVER an aggregate: monthly revenue
    with running cumulative total, 3-month moving average,
    share-of-year, and month-over-month delta in one pass.

Determinism follows the engine-wide policy (queries/_util.py): money
math in exact DECIMAL, cast to DOUBLE only at the edge; window sums run
over DECIMAL so frame-order cannot perturb a bit; every derived column
aliased identically on both sides.
"""

from __future__ import annotations

from local_etl_spark.queries.sql_tpch import _sql_query

_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(1 - l_discount AS DECIMAL(18,6))
                          AS DECIMAL(18,6))
                     * CAST(1 + l_tax AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS sum_charge,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) / count(*) AS avg_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) / count(*) AS avg_price,
       CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

_Q12A = """
SELECT ship_class,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM (
  SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
              THEN 'PROMPT' ELSE 'DELAYED' END AS ship_class,
         o_orderpriority
  FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '2000-01-01'
    AND l_shipdate < TIMESTAMP '2001-01-01'
) line_classes
GROUP BY ship_class
ORDER BY ship_class
"""

_WINDOW_ROLLUP = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
              AS DECIMAL(28,6)) AS rev
  FROM orders
  GROUP BY date_trunc('month', o_orderdate)
)
SELECT month,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(sum(rev) OVER (ORDER BY month
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           AS cum_revenue,
       CAST(sum(rev) OVER (ORDER BY month
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DOUBLE)
           / count(*) OVER (ORDER BY month
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS ma3_revenue,
       CAST(rev AS DOUBLE)
           / CAST(sum(rev) OVER (PARTITION BY date_trunc('year', month))
                  AS DOUBLE) AS share_of_year,
       CAST(rev AS DOUBLE) - CAST(lag(rev) OVER (ORDER BY month)
                                  AS DOUBLE) AS mom_delta
FROM monthly
ORDER BY month
"""

sql_q1 = _sql_query(
    "sql_q1",
    _Q1,
    "TPC-H Q1 (pricing summary report), faithful text: the full "
    "sum/avg battery over the quasi-whole lineitem scan. Every sum "
    "runs in exact DECIMAL (the chained disc*tax product stays within "
    "scale 6, so the (18,6) squeeze between the two multiplications "
    "is exact); averages divide the identical exact sum by count(*), "
    "making all eight aggregates bit-identical across engines and "
    "partition orders. Plan: one scan (shipdate predicate pushed), "
    "one partial+final hash aggregate on a 6-group key — the "
    "archetypal map-side-combine query; at 100 TB it moves 6 rows per "
    "task into the final agg.",
)
sql_q12a = _sql_query(
    "sql_q12a",
    _Q12A,
    "TPC-H Q12 (shipping modes and order priority) restated without "
    "l_shipmode/l_commitdate/l_receiptdate: lines in a one-year "
    "shipdate window classify as PROMPT/DELAYED by ship delay vs "
    "order date (<= 30 days), counting critical- vs normal-priority "
    "orders per class — Q12's exact conditional-count-per-class "
    "shape. count(CASE WHEN...) keeps BIGINT typing identical in "
    "both engines. Plan: shipdate range pushes into the lineitem "
    "scan; one shuffle join on orderkey; 2-group aggregate.",
)
sql_window_rollup = _sql_query(
    "sql_window_rollup",
    _WINDOW_ROLLUP,
    "Windows over an aggregate (the reporting-rollup shape): monthly "
    "order revenue with running cumulative total, 3-month moving "
    "average, share-of-year, and month-over-month delta. The monthly "
    "CTE aggregates first (one shuffle), then all four window "
    "functions evaluate over the ~tens-of-rows monthly relation — "
    "window sums stay in DECIMAL so frame evaluation order cannot "
    "change a bit; the year share partitions by date_trunc of the "
    "month key (no second shuffle of the base data). At 100 TB the "
    "window input is the aggregate, never the fact table.",
)


# ---- Spark 4 SQL front-door extensions -------------------------------
# These two cannot share query text with DuckDB (pipe syntax and SQL
# scripting are Spark-4 dialect), so unlike the rest of the sql family
# the oracle is the equivalent STANDARD SQL — the check is still
# engine-vs-engine on the same semantics.

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from local_etl_spark.catalog import register_views  # noqa: E402
from local_etl_spark.registry import query  # noqa: E402

_PIPE = """
FROM lineitem
|> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
     AND l_shipdate < TIMESTAMP '1997-01-01'
|> AGGREGATE
     CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l_discount AS DECIMAL(18,6)))
          AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
     count(*) AS n
   GROUP BY l_returnflag, l_linestatus
|> WHERE n > 0
|> SELECT l_returnflag, l_linestatus, revenue, n
|> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag, l_linestatus
HAVING count(*) > 0
ORDER BY l_returnflag, l_linestatus
"""


@query("sql_pipe", family="sql", oracle=_PIPE_ORACLE)
def sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 / GoogleSQL-style ``|>`` operators):
    the same one-year revenue aggregate as standard SQL, written as a
    linear left-to-right pipeline — FROM |> WHERE |> AGGREGATE …
    GROUP BY |> WHERE (post-agg = HAVING) |> SELECT |> ORDER BY. The
    parser desugars to the identical logical plan (filters still push
    to the scan, aggregate still partial+final), so pipe syntax is a
    FRONT-DOOR feature with zero plan cost — asserted by hash-parity
    with the standard-SQL oracle, the one sql-family query where the
    two engines deliberately run different text for the same
    semantics."""
    register_views(spark, sf_dir)
    return spark.sql(_PIPE)


_SCRIPT = """
BEGIN
  DECLARE cutoff DOUBLE DEFAULT 0.0;
  DECLARE seg STRING DEFAULT '';
  SET cutoff = (SELECT avg(o_totalprice) FROM orders);
  IF cutoff > 0 THEN
    SET seg = 'above';
  ELSE
    SET seg = 'below';
  END IF;
  SELECT seg AS segment,
         CAST(cutoff AS DOUBLE) AS cutoff,
         count(*) AS n_orders,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
              AS DECIMAL(28,6)) AS DOUBLE) AS revenue
  FROM orders
  WHERE o_totalprice > cutoff;
END
"""

_SCRIPT_ORACLE = """
WITH c AS (SELECT avg(o_totalprice) AS cutoff FROM orders)
SELECT 'above' AS segment,
       CAST(c.cutoff AS DOUBLE) AS cutoff,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS revenue
FROM orders, c
WHERE o_totalprice > c.cutoff
GROUP BY c.cutoff
"""


@query("sql_scripting", family="sql", oracle=_SCRIPT_ORACLE)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN…END blocks): session variables,
    a scalar-subquery SET, and IF/ELSE control flow feeding the final
    statement — the procedural front door (migration target for stored
    procedures). The script's last statement is the result. Determinism
    caveat worth stating: ``avg(double)`` is summation-order-dependent
    in general; here the cutoff COMPARISON is against values ≥ 2 ulp
    away (prices are 2dp, the mean at this SF is not within double
    noise of any price), and the reported aggregates re-run through
    the exact-decimal policy, so both engines agree bit-for-bit —
    checked at sf0.01 and sf0.1. Scale: variables and control flow run
    on the driver; every statement is still a full distributed plan."""
    register_views(spark, sf_dir)
    return spark.sql(_SCRIPT)


# --- round-3 SQL-surface additions -------------------------------------

_GROUP_BY_ALL = """
SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
       count(*) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ALL
"""

sql_group_by_all = _sql_query(
    "sql_group_by_all",
    _GROUP_BY_ALL,
    "GROUP BY ALL (Spark 3.4+/DuckDB shared syntax): every "
    "non-aggregate select item becomes a grouping key, eliminating the "
    "classic copy-the-select-list maintenance bug. One dialect-neutral "
    "text on both engines; semantically identical to the explicit "
    "GROUP BY 1,2,3 plan (same partial+final hash aggregate), so the "
    "sugar costs nothing at any scale.",
)

_UNPIVOT = """
SELECT c_mktsegment, metric, val
FROM (
  SELECT c_mktsegment,
         CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
              AS DECIMAL(28,6)) AS DOUBLE) AS total_bal,
         CAST(count(*) AS DOUBLE) AS n_cust,
         CAST(max(c_custkey) AS DOUBLE) AS max_key
  FROM customer GROUP BY c_mktsegment
) m
UNPIVOT (val FOR metric IN (total_bal, n_cust, max_key))
"""

sql_unpivot = _sql_query(
    "sql_unpivot",
    _UNPIVOT,
    "SQL-standard UNPIVOT clause (Spark 3.4+ and DuckDB share the "
    "text): a per-segment metric block rotates into tidy (segment, "
    "metric, value) rows — the SQL front door to agg_unpivot's "
    "DataFrame stack() shape. Metrics are pre-cast to one DOUBLE type "
    "because UNPIVOT requires a common value type; the rotation itself "
    "is a map-side Expand (rows × metrics), no shuffle beyond the "
    "source aggregate.",
)


@query(
    "sql_distinct_on",
    family="sql",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON emulation — latest order per customer.

    DuckDB/Postgres DISTINCT ON keeps the first row per key under the
    query's ORDER BY; Spark has no such clause, so the engine form is
    the max_by-on-a-composite-key aggregate: one partial+final hash
    aggregate where each task ships a single champion row per key —
    strictly cheaper than the row_number()=1 window, which must sort
    every partition (SCALE.md §11: count/rank-over-window = a sort).
    The composite (o_orderdate, o_orderkey) max key makes the champion
    unique, so both engines pick the identical row.
    """
    from pyspark.sql import functions as F

    from local_etl_spark.queries._util import t

    o = t(spark, sf_dir, "orders")
    key = F.struct("o_orderdate", "o_orderkey")
    g = o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", key).alias("o_orderkey"),
        F.max_by("o_orderdate", key).alias("o_orderdate"),
        F.max_by(F.col("o_totalprice").cast("double"), key).alias(
            "o_totalprice"
        ),
    )
    return g.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


_PARAMS_TEXT = """
SELECT o_orderpriority,
       count(*) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = :status
  AND o_orderdate >= CAST(:cutoff AS TIMESTAMP)
GROUP BY o_orderpriority
"""


@query(
    "sql_params",
    family="sql",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_orderdate >= CAST('1997-01-01' AS TIMESTAMP)
    GROUP BY o_orderpriority
    """,
)
def sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers, Spark 3.4+):
    ``:status`` / ``:cutoff`` bind server-side through ``spark.sql(...,
    args=...)`` — the injection-safe front door for templated queries
    (vs string interpolation, which both injects and defeats plan
    caching). The oracle is the same text with literals inlined, so
    parity proves binding changes nothing semantically. Plan: binding
    happens at parse time; the bound literal still drives predicate
    pushdown and partition pruning exactly like an inline constant."""
    register_views(spark, sf_dir)
    return spark.sql(
        _PARAMS_TEXT, args={"status": "F", "cutoff": "1997-01-01"}
    )


@query(
    "sql_exec_immediate",
    family="sql",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal >= 1000.0
    GROUP BY c_mktsegment
    """,
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE (Spark 4): dynamic SQL — a query held in a
    string variable — executed with positional ``?`` binds via USING,
    the migration target for stored-procedure-style dynamic statements.
    The dynamic text compiles to exactly the plan of its static
    equivalent (which is what the oracle runs)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT c_mktsegment,
                  count(*) AS n,
                  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                       AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
           FROM customer
           WHERE c_acctbal >= ?
           GROUP BY c_mktsegment'
          USING 1000.0
        """
    )


@query(
    "sql_udf",
    family="sql",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(1 - l_discount AS DECIMAL(18,6))
                          AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS disc_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 ``CREATE FUNCTION ...
    RETURN <expr>``): the discounted-price formula lives ONCE as a
    catalog object instead of being copy-pasted into every query — and
    because the body is a SQL expression, Catalyst INLINES it (no UDF
    call boundary, full codegen/pushdown), unlike Python UDFs. The
    oracle inlines the identical expression by hand; parity proves the
    function boundary is semantically free. The function returns exact
    DECIMAL so the aggregate keeps the engine-wide determinism policy."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(18,6)
        RETURN CAST(CAST(p AS DECIMAL(18,6))
                    * CAST(1 - d AS DECIMAL(18,6)) AS DECIMAL(18,6))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               CAST(CAST(sum(disc_price(l_extendedprice, l_discount))
                    AS DECIMAL(28,6)) AS DOUBLE) AS disc_revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


N_QTY_BUCKETS = 5
QTY_BUCKET_WIDTH = 10


@query(
    "sql_table_fn",
    family="sql",
    oracle=f"""
    WITH buckets AS (
        SELECT CAST(i AS INT) AS bucket,
               i * {QTY_BUCKET_WIDTH} AS lo,
               (i + 1) * {QTY_BUCKET_WIDTH} AS hi
        FROM generate_series(0, {N_QTY_BUCKETS - 1}) AS t(i)
    )
    SELECT b.bucket, b.lo, b.hi, count(l.l_quantity) AS n
    FROM buckets b
    LEFT JOIN lineitem l
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket, b.lo, b.hi
    """,
)
def sql_table_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (Spark 4 ``RETURNS TABLE``): a
    parameterized bucket spine generated by a catalog TVF and consumed
    like any relation — the reusable-dimension pattern (calendar
    spines, bucket edges, tier tables) without materializing a table.
    The TVF body is a bounded ``range`` filtered by the argument
    (Spark requires foldable range bounds), and the bucket join is a
    broadcast of the spine. Oracle re-derives the spine from
    generate_series."""
    register_views(spark, sf_dir)
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION qty_buckets(n INT)
        RETURNS TABLE(bucket INT, lo BIGINT, hi BIGINT)
        RETURN SELECT CAST(id AS INT) AS bucket,
                      id * {QTY_BUCKET_WIDTH} AS lo,
                      (id + 1) * {QTY_BUCKET_WIDTH} AS hi
               FROM range(0, 1000) WHERE id < n
        """
    )
    return spark.sql(
        f"""
        SELECT b.bucket, b.lo, b.hi, count(l.l_quantity) AS n
        FROM qty_buckets({N_QTY_BUCKETS}) b
        LEFT JOIN lineitem l
          ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        GROUP BY b.bucket, b.lo, b.hi
        """
    )


_FILTER_CLAUSE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_large,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 FILTER (WHERE o_orderstatus = 'F')
            AS DECIMAL(28,6)) AS DOUBLE) AS finished_revenue
FROM orders
GROUP BY o_orderpriority
"""

sql_filter_clause = _sql_query(
    "sql_filter_clause",
    _FILTER_CLAUSE,
    "Aggregate FILTER clause (SQL:2003, shared Spark/DuckDB text): "
    "per-aggregate predicates without the sum(CASE WHEN ...) "
    "contortion — several conditional metrics in ONE pass over ONE "
    "grouped aggregate. Plans identically to the CASE form (the "
    "filter folds into the aggregate's input projection), so the "
    "sugar is free at any scale; the filtered decimal sum keeps the "
    "engine-wide money discipline.",
)


_ORDER_BY_ALL = """
SELECT c_mktsegment,
       c_nationkey,
       count(*) AS n_cust,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
            AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
FROM customer
GROUP BY ALL
ORDER BY ALL
"""

sql_order_by_all = _sql_query(
    "sql_order_by_all",
    _ORDER_BY_ALL,
    "ORDER BY ALL (Spark 4 / DuckDB shared syntax), paired with GROUP "
    "BY ALL: the whole select list becomes the sort key left-to-right "
    "— the interactive-analytics idiom that keeps the ordering in sync "
    "with the projection by construction. Plans as an ordinary "
    "aggregate + range-partitioned global sort over the (tiny) "
    "segment×nation grid; nothing about the sugar changes the "
    "physical shape.",
)


@query(
    "sql_star_except",
    family="sql",
    oracle="""
    SELECT * EXCLUDE (o_orderstatus, o_orderpriority)
    FROM orders
    """,
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-projection with column subtraction — Spark spells it
    ``SELECT * EXCEPT (...)`` (3.4+), DuckDB ``* EXCLUDE (...)``; the
    one dialect split in the SQL-surface family, kept because the
    operation itself (schema-stable wide scans minus bookkeeping
    columns) is everyday ELT. The projection resolves at ANALYSIS
    time, so column pruning reaches the parquet scan exactly as an
    explicit column list would — ReadSchema drops the excluded
    columns; no runtime cost anywhere.
    """
    from local_etl_spark.queries.sql_tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (o_orderstatus, o_orderpriority) FROM orders"
    )


@query(
    "sql_identifier",
    family="sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 4): table AND column names bound
    from parameters — the injection-safe way to template the
    STRUCTURAL parts of a query, which ordinary parameter markers
    (sql_params) cannot touch (markers bind values, never
    identifiers; string interpolation of names is the SQL-injection
    classic). The oracle is the resolved text, so parity proves the
    indirection changes nothing semantically; resolution happens at
    ANALYSIS time, so pushdown/pruning see an ordinary column
    reference."""
    from local_etl_spark.queries.sql_tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:gcol) AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(IDENTIFIER(:kcol)) AS BIGINT) AS max_key
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:gcol)
        ORDER BY IDENTIFIER(:gcol)
        """,
        args={"tbl": "orders", "gcol": "o_orderpriority", "kcol": "o_orderkey"},
    )


@query(
    "sql_window_clause",
    family="sql",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(count(*) OVER w AS BIGINT) AS n_orders,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,6))
                 - CAST(first_value(o_totalprice) OVER w AS DECIMAL(18,6)),
                 2) AS DOUBLE) AS delta_vs_best
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                 o_orderkey)
    """,
)
def sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (SQL:2003): one window definition shared by
    three window functions — the deduplication feature that keeps
    real analytics SQL maintainable (and guarantees all three
    functions see the IDENTICAL frame, where copy-pasted OVER(...)
    clauses drift apart). Spark and DuckDB share the syntax verbatim.

    Plan: all three functions evaluate in ONE WindowExec over one
    exchange — the named clause is resolved at analysis time, not a
    per-function window. delta stays in exact DECIMAL (2dp inputs).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey,
               o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(count(*) OVER w AS BIGINT) AS n_orders,
               CAST(round(CAST(o_totalprice AS DECIMAL(18,6))
                     - CAST(first_value(o_totalprice) OVER w AS DECIMAL(18,6)),
                     2) AS DOUBLE) AS delta_vs_best
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                     o_orderkey)
        """
    )
