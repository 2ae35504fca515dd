"""Join queries (SURVEY.md §2.4-D).

The reference never joins two tables (SURVEY.md §2.3 — its only cross-table
relationships are latent keys, e.g. the event_id FK written at
reference main2.py:226); this whole family is a north-star extension.

Scale notes per query are in the docstrings: dimension joins broadcast
(no shuffle), fact-fact joins shuffle on the join key and rely on AQE for
skew; the as-of join is a single-shuffle union+window — the scalable
alternative to a per-key loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import dec, dsum, t
from local_etl_spark.registry import query


@query(
    "join_inner",
    family="joins",
    oracle="""
SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
       o.o_custkey AS custkey, o.o_orderstatus AS orderstatus,
       CAST(l.l_extendedprice AS DOUBLE) AS price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join lineitem⋈orders; Catalyst/AQE picks the physical
    strategy (SMJ or shuffled hash; broadcast at small SF)."""
    li, o = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .where(o.o_orderstatus == "F")
        .select(
            li.l_orderkey.alias("orderkey"),
            li.l_linenumber.alias("linenumber"),
            o.o_custkey.alias("custkey"),
            o.o_orderstatus.alias("orderstatus"),
            li.l_extendedprice.alias("price"),
        )
    )


@query(
    "join_left",
    family="joins",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name,
       o.o_orderkey AS orderkey, CAST(o.o_totalprice AS DOUBLE) AS totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an ON-clause (not WHERE) secondary predicate —
    preserves customers with no 'P' orders as null rows."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "P"), "left"
    ).select(
        c.c_custkey.alias("custkey"),
        c.c_name.alias("name"),
        o.o_orderkey.alias("orderkey"),
        o.o_totalprice.alias("totalprice"),
    )


@query(
    "join_right",
    family="joins",
    oracle="""
SELECT o.o_orderkey AS orderkey, c.c_custkey AS custkey, c.c_mktsegment AS segment
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal < 1000
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (Spark plans it as the mirrored left join)."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .where(c.c_acctbal < 1000)
        .select(
            o.o_orderkey.alias("orderkey"),
            c.c_custkey.alias("custkey"),
            c.c_mktsegment.alias("segment"),
        )
    )


@query(
    "join_full",
    family="joins",
    oracle="""
WITH hi_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
     big_ord AS (SELECT o_custkey, count(*) AS n_big
                 FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey)
SELECT hc.c_custkey AS custkey, CAST(hc.c_acctbal AS DOUBLE) AS acctbal,
       bo.o_custkey AS ord_custkey, bo.n_big AS n_big
FROM hi_cust hc FULL JOIN big_ord bo ON hc.c_custkey = bo.o_custkey
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered derivations — rows survive from
    both unmatched sides."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    hi = c.where(c.c_acctbal > 9000).select("c_custkey", "c_acctbal")
    big = (
        o.where(o.o_totalprice > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return hi.join(big, hi.c_custkey == big.o_custkey, "full").select(
        hi.c_custkey.alias("custkey"),
        hi.c_acctbal.alias("acctbal"),
        big.o_custkey.alias("ord_custkey"),
        F.col("n_big"),
    )


@query(
    "join_semi",
    family="joins",
    oracle="""
SELECT c_custkey AS custkey, c_name AS name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one very large order."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.join(
        o.where(o.o_totalprice > 400000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select(c.c_custkey.alias("custkey"), c.c_name.alias("name"))


@query(
    "join_anti",
    family="joins",
    oracle="""
SELECT c_custkey AS custkey, c_mktsegment AS segment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        c.c_custkey.alias("custkey"), c.c_mktsegment.alias("segment")
    )


@query(
    "join_broadcast",
    family="joins",
    oracle="""
SELECT n.n_name AS nation, r.r_name AS region,
       count(*) AS n_custs,
       CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
ORDER BY nation
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim⋈dim with explicit broadcast hints: nation/region ship to
    every executor, the customer scan never shuffles for the join (the
    only shuffle is the final aggregation). This is the 100 TB shape —
    dims are KBs, facts are TBs."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(dec("c_acctbal")).alias("total_bal"),
        )
        .orderBy("nation")
    )


@query(
    "join_theta",
    family="joins",
    oracle="""
SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
       count(*) AS n_richer_custs
FROM supplier s JOIN customer c ON c.c_acctbal > s.s_acctbal
GROUP BY s.s_suppkey, s.s_name
ORDER BY suppkey
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join — Spark plans BroadcastNestedLoopJoin with
    the small supplier side broadcast; the pair count is aggregated
    immediately so the blow-up never materializes."""
    s, c = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "customer")
    return (
        F.broadcast(s)
        .join(c, c.c_acctbal > s.s_acctbal)
        .groupBy(s.s_suppkey.alias("suppkey"), s.s_name.alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("n_richer_custs"))
        .orderBy("suppkey")
    )


@query(
    "join_cross",
    family="joins",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation
FROM region r CROSS JOIN nation n
""",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two bounded dimensions."""
    r, n = t(spark, sf_dir, "region"), t(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    )


@query(
    "join_asof",
    family="joins",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
       c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior-or-equal click
    by the same user.

    Spark has no native ASOF JOIN; the scalable pattern is union + last()
    over an ordered window — ONE shuffle on user_id and a partition-local
    sort, versus the quadratic range-join a naive implementation does.
    Rows tagged kind=0 (click) sort before kind=1 (purchase) at equal ts,
    so an exactly-simultaneous click is visible to the purchase — matching
    DuckDB's ``>=`` ASOF semantics.
    """
    e = t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .where((F.col("kind") == 1) & F.col("last_click").isNotNull())
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("last_click").alias("click_ts"),
        )
    )


@query(
    "join_asof_forward",
    family="joins",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
       (SELECT min(c.ts) FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts > p.ts) AS next_click_ts
FROM events p
WHERE p.event_type = 'purchase'
  AND EXISTS (SELECT 1 FROM events c
              WHERE c.event_type = 'click' AND c.user_id = p.user_id
                AND c.ts > p.ts)
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'): for
    each purchase, the EARLIEST click STRICTLY after it by the same
    user — "what did they do next". Same union + ordered-window pattern
    as join_asof, mirrored: scan in DESCENDING ts so "last click seen"
    is the smallest click ts above the current row; at equal ts the
    purchase sorts BEFORE the clicks (kind DESC) so a simultaneous
    click is NOT matched — strict-inequality semantics, which is what
    the oracle's correlated min subquery (> p.ts) states. One shuffle
    on user_id + one partition-local sort, same as the backward
    variant; the oracle's correlated-subquery form is what this plan
    replaces (Spark would decorrelate it to an aggregate join, DuckDB
    evaluates it as written — both equal the window answer).
    """
    e = t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("next_click", F.last("click_ts", ignorenulls=True).over(w))
        .where((F.col("kind") == 1) & F.col("next_click").isNotNull())
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("next_click").alias("next_click_ts"),
        )
    )


@query(
    "join_multiway",
    family="joins",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       count(DISTINCT c.c_custkey) AS n_custs,
       count(o.o_orderkey) AS n_orders,
       CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY r.r_name, n.n_name
ORDER BY region, nation
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table star: dims broadcast onto the orders→customer spine, so the
    whole query costs one customer⋈orders shuffle + one agg shuffle."""
    r = F.broadcast(t(spark, sf_dir, "region"))
    n = F.broadcast(t(spark, sf_dir, "nation"))
    c, o = t(spark, sf_dir, "customer"), t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("c_custkey").alias("n_custs"),
            F.count("o_orderkey").alias("n_orders"),
            dsum(dec("o_totalprice")).alias("revenue"),
        )
        .orderBy("region", "nation")
    )


@query(
    "join_exists_flag",
    family="joins",
    oracle="""
SELECT c.c_custkey,
       c.c_mktsegment,
       EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderstatus = 'P') AS has_pending,
       EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 300000) AS has_big
FROM customer c
""",
)
def join_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence decoration: EXISTS as a boolean COLUMN (not a filter)
    — every customer row survives, annotated with per-predicate flags.
    Spark plans each flag as ExistenceJoin, the semi-join variant that
    emits a bit instead of dropping rows: one aggregate-free pass per
    probe side, no row multiplication when a customer has many matching
    orders (a left join + groupBy would shuffle the full match set).
    Expressed via spark.sql because the DataFrame API has no
    ExistenceJoin constructor — the optimizer derives it from EXISTS
    subqueries (the same decorrelation path the semi/anti SQL forms
    exercise)."""
    from local_etl_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey,
               c.c_mktsegment,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderstatus = 'P') AS has_pending,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000) AS has_big
        FROM customer c
        """
    )


@query(
    "join_null_safe",
    family="joins",
    oracle="""
WITH a AS (
    SELECT CASE WHEN c_custkey % 500 = 0 THEN NULL
                ELSE c_mktsegment END AS seg_key,
           c_custkey
    FROM customer
),
b AS (
    SELECT CASE WHEN c_custkey % 700 = 0 THEN NULL
                ELSE c_mktsegment END AS seg_key,
           c_acctbal
    FROM customer WHERE c_custkey % 10 = 0
)
SELECT a.seg_key, count(*) AS n_pairs
FROM a JOIN b ON a.seg_key IS NOT DISTINCT FROM b.seg_key
GROUP BY a.seg_key
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of disappearing — the semantics a
    dirty-key reconciliation join needs (plain = silently drops every
    NULL row from both sides). Spark keeps <=> a HASH join key
    (EqualNullSafe is an equi-condition), so the plan is a normal
    broadcast/shuffled hash join — no nested-loop fallback. NULL rows
    are kept rare by construction (every 500th/700th key), mirroring
    the real-world shape where the null bucket would otherwise need
    skew handling."""
    c = t(spark, sf_dir, "customer")
    a = c.select(
        F.when(F.col("c_custkey") % 500 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_key"),
        "c_custkey",
    )
    b = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.when(F.col("c_custkey") % 700 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_key_b"),
        "c_acctbal",
    )
    return (
        a.join(b, a.seg_key.eqNullSafe(b.seg_key_b))
        .groupBy("seg_key")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_scd2_pit",
    family="joins",
    oracle="""
    WITH dim AS (
        SELECT o_custkey AS custkey,
               CAST(o_totalprice AS DOUBLE) AS attr_totalprice,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS valid_to,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS version_no
        FROM orders
    ),
    fact AS (
        SELECT l_orderkey, l_linenumber, o_custkey AS custkey, l_shipdate,
               l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT version_no, count(*) AS n_lines,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS qty,
           CAST(CAST(sum(CAST(attr_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS attr_sum
    FROM fact
    JOIN dim ON fact.custkey = dim.custkey
            AND fact.l_shipdate >= dim.valid_from
            AND (dim.valid_to IS NULL OR fact.l_shipdate < dim.valid_to)
    GROUP BY version_no
    """,
)
def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against an SCD2 dimension: each
    shipped line joins the customer-state VERSION that was valid at its
    ship date — the consumption side of etl_scd2 (building history is
    half the op; joining facts to the right version is why you built
    it).

    Plan shape: the version intervals partition each key's timeline, so
    the interval predicate matches AT MOST ONE version per fact row —
    an equi-join on custkey with the range residual evaluated inside
    the matched key group. One shuffle per side on custkey, no
    banding needed (unlike join_range_banded's arbitrary-overlap case)
    because intervals within a key are disjoint by construction.
    Summing per version keeps the checked result version-grained.
    """
    from local_etl_spark.queries.etl import etl_scd2

    dim = etl_scd2(spark, sf_dir).select(
        "custkey", "attr_totalprice", "valid_from", "valid_to", "version_no"
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey").alias("custkey")
    )
    fact = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("custkey", "l_shipdate", "l_quantity")
    )
    cond = (
        (fact.custkey == dim.custkey)
        & (fact.l_shipdate >= dim.valid_from)
        & (dim.valid_to.isNull() | (fact.l_shipdate < dim.valid_to))
    )
    return (
        fact.join(dim, cond)
        .groupBy("version_no")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("qty"),
            F.sum(F.col("attr_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("attr_sum"),
        )
    )


@query(
    "join_asof_nearest",
    family="joins",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, ts AS cts
        FROM events WHERE event_type = 'click'
    ),
    cand AS (
        SELECT p.purchase_id, p.user_id, p.pts, c.click_id, c.cts,
               abs(epoch_us(c.cts) - epoch_us(p.pts)) AS gap_us,
               CASE WHEN c.cts <= p.pts THEN 0 ELSE 1 END AS fwd
        FROM p JOIN c ON c.user_id = p.user_id
        WHERE c.cts >= p.pts - INTERVAL 1 HOUR
          AND c.cts <= p.pts + INTERVAL 1 HOUR
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY purchase_id
            ORDER BY gap_us, fwd, click_id) AS rn
        FROM cand
    )
    SELECT purchase_id, user_id, pts AS purchase_ts,
           click_id, cts AS click_ts,
           CAST(gap_us AS BIGINT) AS gap_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join — the third as-of flavor (join_asof
    is backward, join_asof_forward forward): each purchase pairs with
    the temporally CLOSEST click within ±1 h in either direction, the
    matching rule for sensor alignment and nearest-tick enrichment.
    Tie-break (equal gap both directions) prefers the backward match,
    then the lower id — a total order, so both engines pick the same
    row. The gap is exact integer microseconds.

    Shape: per-user candidate join with a two-sided residual bound
    (same shape as the stream-stream interval joins), then one
    partial+final ``min_by``-style champion aggregate per purchase —
    shipped as min(struct(gap, fwd, id, payload)), one champion per
    group per task, cheaper than the rank window's partition sort.
    """
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    cand = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.cts >= F.expr("pts - INTERVAL 1 HOUR"))
        & (c.cts <= F.expr("pts + INTERVAL 1 HOUR")),
    ).select(
        "purchase_id",
        "user_id",
        "pts",
        "click_id",
        "cts",
        # timestampdiff handles TIMESTAMP_NTZ (unix_micros does not)
        F.expr("abs(timestampdiff(MICROSECOND, pts, cts))").alias("gap_us"),
        F.when(F.col("cts") <= F.col("pts"), 0).otherwise(1).alias("fwd"),
    )
    champ = cand.groupBy("purchase_id").agg(
        F.min(
            F.struct("gap_us", "fwd", "click_id", "user_id", "pts", "cts")
        ).alias("m")
    )
    return champ.select(
        "purchase_id",
        F.col("m.user_id").alias("user_id"),
        F.col("m.pts").alias("purchase_ts"),
        F.col("m.click_id").alias("click_id"),
        F.col("m.cts").alias("click_ts"),
        F.col("m.gap_us").cast("bigint").alias("gap_us"),
    )


ASOF_TOLERANCE_MIN = 30


@query(
    "join_asof_tolerance",
    family="joins",
    oracle=f"""
SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
       (SELECT max(c.ts) FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE) AS click_ts
FROM events p WHERE p.event_type = 'purchase'
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance: each purchase attributes to
    the most recent prior click ONLY if it happened within the last 30
    minutes; stale matches become NULL instead of silently linking a
    purchase to a days-old click (the market-data/attribution
    semantics pandas merge_asof calls ``tolerance``). LEFT semantics:
    every purchase appears exactly once.

    Scale: identical one-exchange union+last() shape as join_asof —
    the tolerance is a post-window filter ON THE MATCHED VALUE, so it
    adds zero shuffles; the naive per-row range join it replaces is
    quadratic in the per-user event count.
    """
    e = t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # in_tol must reference the MATERIALIZED window column: re-using
    # the window expression inside the post-filter select would plan a
    # SECOND WindowExec over the already-filtered (purchases-only)
    # relation, where every click_ts is NULL
    in_tol = F.col("last_click") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTES"
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.when(in_tol, F.col("last_click")).alias("click_ts"),
        )
    )


@query(
    "join_allen_relations",
    family="joins",
    oracle="""
    WITH iv AS (
        SELECT s_suppkey, n_name,
               min(l_shipdate) AS lo, max(l_shipdate) AS hi
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY s_suppkey, n_name
    ),
    pairs AS (
        SELECT a.n_name,
               CASE WHEN a.hi < b.lo THEN 'before'
                    WHEN a.hi = b.lo THEN 'meets'
                    WHEN a.lo = b.lo AND a.hi = b.hi THEN 'equal'
                    WHEN a.lo = b.lo THEN 'starts'
                    WHEN a.hi = b.hi THEN 'finishes'
                    WHEN a.hi > b.hi THEN 'contains'
                    ELSE 'overlaps' END AS rel
        FROM iv a JOIN iv b
          ON a.n_name = b.n_name
         AND (a.lo, a.hi, a.s_suppkey) < (b.lo, b.hi, b.s_suppkey)
    )
    SELECT n_name, rel, CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY n_name, rel
    """,
)
def join_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra over supplier shipping spans: classify
    every same-nation supplier pair's [first, last]-shipment intervals
    into the canonical temporal relations (before/meets/overlaps/
    starts/finishes/contains/equal) and count per nation — the
    exhaustive-and-exclusive temporal-join taxonomy underlying
    join_interval_overlap (which keeps ONE relation class) and
    join_asof (which keeps one DIRECTION).

    Canonicalization makes the 13 Allen relations collapse to 7 with
    no ambiguity: pairs order by (lo, hi, suppkey) tuple comparison —
    identical lexicographic row-constructor semantics in both engines
    — so interval a never starts after b, which eliminates the 6
    inverses, and the CASE fires exactly one branch per pair (total:
    every pair lands somewhere; the suppkey tiebreak keeps identical
    intervals in the join exactly once). All compares are exact
    timestamps. Scale: intervals are a dimension-sized aggregate; the
    pair join blocks on the nation key, so the quadratic term is
    bounded by the largest nation's supplier count — the
    join_fuzzy-style blocked-pairs class, never corpus-quadratic.
    """
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_shipdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    iv = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "n_name")
        .agg(
            F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
        )
        .persist()
    )
    a = iv.select(
        F.col("n_name"),
        F.col("lo").alias("alo"),
        F.col("hi").alias("ahi"),
        F.col("s_suppkey").alias("ak"),
    )
    b = iv.select(
        F.col("n_name"),
        F.col("lo").alias("blo"),
        F.col("hi").alias("bhi"),
        F.col("s_suppkey").alias("bk"),
    )
    canon = F.struct("alo", "ahi", "ak") < F.struct("blo", "bhi", "bk")
    rel = (
        F.when(F.col("ahi") < F.col("blo"), "before")
        .when(F.col("ahi") == F.col("blo"), "meets")
        .when(
            (F.col("alo") == F.col("blo")) & (F.col("ahi") == F.col("bhi")),
            "equal",
        )
        .when(F.col("alo") == F.col("blo"), "starts")
        .when(F.col("ahi") == F.col("bhi"), "finishes")
        .when(F.col("ahi") > F.col("bhi"), "contains")
        .otherwise("overlaps")
    )
    return (
        a.join(b, "n_name")
        .filter(canon)
        .select("n_name", rel.alias("rel"))
        .groupBy("n_name", "rel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
