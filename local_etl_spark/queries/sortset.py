"""Sort / limit / top-k / set operations (SURVEY.md §2.4-G).

The order-insensitive oracle hash can't see row order, so sort queries
materialize their ordering as a rank column computed over the same total
order — making sort correctness hash-visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query


@query(
    "sort_multi",
    family="sortset",
    oracle="""
SELECT c_custkey AS custkey, seg_nullable AS segment, CAST(c_acctbal AS DOUBLE) AS acctbal,
       CAST(row_number() OVER (
         ORDER BY seg_nullable ASC NULLS LAST, c_acctbal DESC, c_custkey ASC
       ) AS BIGINT) AS pos
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_nullable, c_acctbal
      FROM customer)
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST; the ordering is emitted as
    a `pos` column so the oracle hash verifies it. The tie-breaking key
    (c_custkey) makes the order total, hence deterministic."""
    c = t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullable"),
        "c_acctbal",
    )
    w = Window.orderBy(
        F.col("seg_nullable").asc_nulls_last(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )
    return base.select(
        F.col("c_custkey").alias("custkey"),
        F.col("seg_nullable").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.row_number().over(w).cast("long").alias("pos"),
    ).orderBy("pos")


@query(
    "topk",
    family="sortset",
    oracle="""
SELECT o_orderkey AS orderkey, o_custkey AS custkey, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject: each partition
    keeps its local top 25, only 25×n_partitions rows reach the driver.
    The orderkey tiebreak makes the boundary deterministic."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "topk_per_group",
    family="sortset",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment AS segment, c_custkey AS custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
         CAST(row_number() OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
         ) AS BIGINT) AS rk
  FROM customer
) WHERE rk <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number ≤ k — one shuffle on the group key,
    no global sort."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@query(
    "set_union_all",
    family="sortset",
    oracle="""
SELECT c_custkey AS key, 'customer' AS src FROM customer
UNION ALL
SELECT o_custkey AS key, 'orders' AS src FROM orders
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src")).unionAll(
        o.select(F.col("o_custkey").alias("key"), F.lit("orders").alias("src"))
    )


@query(
    "set_union",
    family="sortset",
    oracle="""
SELECT c_custkey AS key FROM customer
UNION
SELECT o_custkey AS key FROM orders
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union + hash-dedup shuffle on the full row."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        c.select(F.col("c_custkey").alias("key"))
        .union(o.select(F.col("o_custkey").alias("key")))
        .distinct()
    )


@query(
    "set_intersect",
    family="sortset",
    oracle="""
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers with both open and
    finished orders."""
    o = t(spark, sf_dir, "orders")
    open_k = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("key"))
    done_k = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("key"))
    return open_k.intersect(done_k)


@query(
    "set_except",
    family="sortset",
    oracle="""
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey AS key FROM orders
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer keys never appearing in orders.
    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll().distinct()``
    would wrongly keep keys that occur in both sides with higher
    multiplicity on the left)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.select(F.col("c_custkey").alias("key")).subtract(
        o.select(F.col("o_custkey").alias("key"))
    )


@query(
    "set_intersect_all",
    family="sortset",
    oracle="""
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each customer key survives
    min(open-count, finished-count) times. Spark plans a single
    count-matching hash aggregate per side key — one shuffle, no join
    blow-up, multiplicities reconciled in the aggregate."""
    o = t(spark, sf_dir, "orders")
    open_k = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    done_k = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    return open_k.intersectAll(done_k)


@query(
    "set_except_all",
    family="sortset",
    oracle="""
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference): open-order occurrences minus
    finished-order occurrences per key — multiplicity max(l - r, 0),
    planned as one count-diff aggregate (no per-row anti-join)."""
    o = t(spark, sf_dir, "orders")
    open_k = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("key")
    )
    done_k = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key")
    )
    return open_k.exceptAll(done_k)


@query(
    "set_symmetric_diff",
    family="sortset",
    oracle="""
    (SELECT DISTINCT o_custkey AS custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1998-01-01'
       AND o_orderdate < TIMESTAMP '1999-01-01'
     EXCEPT
     SELECT DISTINCT o_custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1999-01-01'
       AND o_orderdate < TIMESTAMP '2000-01-01')
    UNION
    (SELECT DISTINCT o_custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1999-01-01'
       AND o_orderdate < TIMESTAMP '2000-01-01'
     EXCEPT
     SELECT DISTINCT o_custkey FROM orders
     WHERE o_orderdate >= TIMESTAMP '1998-01-01'
       AND o_orderdate < TIMESTAMP '1999-01-01')
    """,
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference (churn-or-new): customers who ordered in
    exactly ONE of 1998/1999 — the set algebra EXCEPT/UNION compose,
    completing the set-operation family. The oracle spells out the
    two-EXCEPT-plus-UNION textbook form; the engine computes the same
    set in ONE pass as an aggregate predicate (count per year, keep
    keys seen in exactly one) — a single shuffle on custkey versus the
    four scans + three set-op exchanges of the literal form, the
    algebraic rewrite that matters when the inputs are 100 TB scans
    rather than CTEs.
    """
    o = t(spark, sf_dir, "orders")
    y98 = (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    y99 = (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    )
    return (
        o.filter(y98 | y99)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(y98.cast("int")).alias("in98"),
            F.max(y99.cast("int")).alias("in99"),
        )
        .filter(F.col("in98") + F.col("in99") == 1)
        .select("custkey")
    )


@query(
    "win_topn_ties",
    family="windows",
    oracle="""
    WITH r AS (
        SELECT n.n_name, o.o_orderkey, o.o_totalprice,
               rank() OVER (PARTITION BY n.n_name
                            ORDER BY o.o_totalprice DESC) AS rnk
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT n_name, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def win_topn_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order values per nation WITH TIES — rank() ≤ k keeps
    every row tied at the boundary, the SQL:2008 FETCH ... WITH TIES
    semantics, versus topk_per_group's row_number cut that
    arbitrarily drops tied rows. Output size is data-dependent (≥ 3k
    rows per nation), which is exactly the point being pinned.

    Determinism: ties produce the SAME extra rows in both engines
    because rank() is order-derived, not tie-broken. Scale: the dims
    broadcast onto the orders scan and the window partitions on the
    nation key — one exchange, per-partition top-k sort.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    w = Window.partitionBy("n_name").orderBy(F.col("o_totalprice").desc())
    return (
        joined.select("n_name", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


TOP_PCT = 1  # top 1% of orders by value


@query(
    "sort_top_percent",
    family="sortset",
    oracle=f"""
    WITH ranked AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM ranked
    WHERE rn <= ceil({TOP_PCT} * n / 100.0)
    """,
)
def sort_top_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 1% of orders by value — the PERCENT variant of top-k, which
    TakeOrderedAndProject cannot plan (k is data-dependent: ceil(p·n)
    isn't known until the count is). The exact rank comes from
    _util.ordered_prefix (range-partitioned global row_number — never
    a single-task window), whose total-count side product sets the
    cutoff without a second pass; the oracle's global window is fine
    in DuckDB, but the Spark side must survive a corpus where 1% is
    still billions of rows.

    Determinism: (o_totalprice DESC, o_orderkey) is a total order and
    the cutoff is exact integer arithmetic on the rank. Scale: one
    range shuffle + per-partition sort; driver state is O(#partitions).
    """
    from local_etl_spark.queries._util import ordered_prefix

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    ranked, n = ordered_prefix(
        o,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        rank_col="rn",
    )
    cutoff = -(-TOP_PCT * n // 100)  # ceil in exact int arithmetic
    return ranked.filter(F.col("rn") <= cutoff).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
