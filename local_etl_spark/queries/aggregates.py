"""Aggregation queries (SURVEY.md §2.4-E) + the flagship TPC-H-Q1 shape.

All Spark-side plans are single hash-aggregates with map-side partial
aggregation (Catalyst plans ``HashAggregate(partial) → shuffle →
HashAggregate(final)``) — the canonical scale-out shape: one shuffle of
pre-combined partials, no driver-side work.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import (
    DEC6,
    _ntile_from_rank,
    davg,
    dec,
    dsum,
    ordered_prefix,
    t,
)
from local_etl_spark.registry import query

# Exact decimal mirror of the arithmetic used in the oracle SQL below.
_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(1 - CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
           * CAST(CAST(1 - CAST(l_discount AS DECIMAL(18,6)) AS DECIMAL(18,6))
                  * CAST(1 + CAST(l_tax AS DECIMAL(18,6)) AS DECIMAL(18,6))
                  AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_charge,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(l_quantity) AS avg_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(l_extendedprice) AS avg_price,
  CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(l_discount) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → 8-agg groupBy → sort.

    The reference has no aggregations at all (SURVEY.md §2.3); this is the
    flagship EXT query exercising scan/filter/project/hash-agg/sort in one
    plan. Filter + column pruning push into the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    one_m_disc = (F.lit(1) - dec("l_discount")).cast(DEC6)
    one_p_tax = (F.lit(1) + dec("l_tax")).cast(DEC6)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(dec("l_extendedprice") * one_m_disc).alias("sum_disc_price"),
            dsum(dec("l_extendedprice") * (one_m_disc * one_p_tax).cast(DEC6)).alias("sum_charge"),
            davg(dec("l_quantity")).alias("avg_qty"),
            davg(dec("l_extendedprice")).alias("avg_price"),
            davg(dec("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


query("agg_groupby", family="aggregations", oracle=_Q1_ORACLE)(tpch_q1)


@query(
    "agg_global",
    family="aggregations",
    oracle="""
SELECT
  count(*) AS n_rows,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS total_price,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(l_quantity) AS avg_qty,
  CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
  CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
  min(l_shipdate) AS first_ship,
  max(l_shipdate) AS last_ship
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate: single-row global summary (partial-agg tree)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(dec("l_extendedprice")).alias("total_price"),
        davg(dec("l_quantity")).alias("avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "agg_distinct",
    family="aggregations",
    oracle="""
SELECT
  o_orderstatus,
  count(DISTINCT o_custkey) AS n_custs,
  count(*) AS n_orders,
  CAST(CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_distinct_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct)/sum(distinct) per group — Spark expands to a
    two-phase distinct-aggregate plan (partial distinct → final)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum_distinct(dec("o_totalprice")).cast("double").alias("sum_distinct_price"),
        )
        .orderBy("o_orderstatus")
    )


_STATS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sx,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sxx,
         CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sy,
         CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS syy,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       (sxx - sx*sx/n) / (n-1) AS var_qty,
       sqrt((sxx - sx*sx/n) / (n-1)) AS sd_qty,
       (sxy - sx*sy/n) / (n-1) AS covar_qty_disc,
       (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) AS corr_qty_disc
FROM m ORDER BY l_returnflag
"""


@query("agg_stats", family="aggregations", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (variance/stddev/covariance/correlation).

    Built-in stddev/corr are summation-order-sensitive doubles — a fixed
    rounding tolerance can always straddle a boundary (observed at
    sf0.01). Instead the moments Σx, Σx², Σxy are accumulated as exact
    decimals and the statistics derived in closed form with IEEE-exact
    double ops (+,*,/,sqrt are all correctly rounded) — bit-identical to
    the oracle running the same formula, with no tolerance at all.
    Magnitude check: qty ≤ 50, disc ≤ 0.1 ⇒ Σx² ≤ ~1.5e8·rows, inside
    the DECIMAL(28,6)→double exact window (<9e9·1e6) through sf10.
    """
    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("l_quantity")).alias("sx"),
        dsum(dec("l_quantity") * dec("l_quantity")).alias("sxx"),
        dsum(dec("l_discount")).alias("sy"),
        dsum(dec("l_discount") * dec("l_discount")).alias("syy"),
        dsum(dec("l_quantity") * dec("l_discount")).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var_q = (sxx - sx * sx / n) / (n - 1)
    covar = (sxy - sx * sy / n) / (n - 1)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "l_returnflag",
        var_q.alias("var_qty"),
        F.sqrt(var_q).alias("sd_qty"),
        covar.alias("covar_qty_disc"),
        corr.alias("corr_qty_disc"),
    ).orderBy("l_returnflag")


_ROLLUP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(grouping(l_returnflag) AS INT) AS g_flag,
  CAST(grouping(l_linestatus) AS INT) AS g_status,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
  count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


@query("agg_rollup", family="aggregations", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping() indicators."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            dsum(dec("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


_CUBE_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INT) AS g_status,
  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_price,
  count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


@query("agg_cube", family="aggregations", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two order dimensions with grouping() indicators."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            dsum(dec("o_totalprice")).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "sum_price", "n")
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


_GSETS_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(grouping(o_orderstatus) AS INT) AS g_status,
  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
  count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


@query("agg_gsets", family="aggregations", oracle=_GSETS_ORACLE)
def agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — expressed via Spark SQL (the DataFrame API
    has no direct grouping-sets builder; SQL is the idiomatic route)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
          o_orderstatus,
          o_orderpriority,
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """
    )


@query(
    "agg_approx_cd",
    family="aggregations",
    tags=("rows-only",),
)
def agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) vs exact — rows-only check;
    HLL implementations differ across engines, so the test asserts the
    estimate is within 5% of exact instead of hash-matching."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query(
    "agg_collect",
    family="aggregations",
    oracle="""
SELECT
  n_regionkey,
  array_to_string(list(n_name ORDER BY n_name), '|') AS nations,
  CAST(len(list(n_name)) AS INT) AS n_nations
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation, sorted inside each group for determinism.

    The collected array is emitted as a '|'-joined string (plus its
    cardinality) — raw array columns are not canonicalizable by the
    driver's pandas-based result hasher, and the joined form carries
    identical information for an ordered string list."""
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations"),
            F.count("n_name").cast("int").alias("n_nations"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_percentile",
    family="aggregations",
    oracle="""
SELECT l_returnflag,
       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 6)
           AS p25,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6)
           AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 6)
           AS p90
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (percentile_cont both
    engines; linear interpolation on identical sorted doubles is
    bit-comparable, rounded 6 dp for safety). The exact form needs a
    per-group sort — at 100 TB prefer approx_percentile (t-digest-ish
    sketch, one pass, mergeable) unless exactness is contractual."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(
                F.expr(f"percentile(l_quantity, {q})"), 6
            ).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.5, 0.9)
        ]
    )


@query(
    "agg_pivot",
    family="aggregations",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS F_cnt,
       count(*) FILTER (o_orderstatus = 'O') AS O_cnt,
       count(*) FILTER (o_orderstatus = 'P') AS P_cnt,
       CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 FILTER (o_orderstatus = 'F'), 0) AS DECIMAL(28,6))
            AS DOUBLE) AS F_rev,
       CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 FILTER (o_orderstatus = 'O'), 0) AS DECIMAL(28,6))
            AS DOUBLE) AS O_rev,
       CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 FILTER (o_orderstatus = 'P'), 0) AS DECIMAL(28,6))
            AS DOUBLE) AS P_rev
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order status becomes columns, one row per
    priority. The values list is given explicitly — at scale an implicit
    pivot needs an extra distinct pass over the data to discover the
    columns; pinning them keeps it a single hash-aggregate (Catalyst
    compiles pivot-with-known-values to one aggregate of
    ``count/sum(CASE WHEN ...)`` columns, no second shuffle)."""
    orders = t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast(DEC6))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("rev"),
        )
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.col(f"{s}_{m}").alias(f"{s}_{m}")
            for m in ("cnt", "rev")
            for s in ("F", "O", "P")
        ],
    )


@query(
    "agg_unpivot",
    family="aggregations",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, value
FROM (
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS quantity,
           CAST(l_extendedprice AS DOUBLE) AS extendedprice,
           CAST(l_discount AS DOUBLE) AS discount
    FROM lineitem
    WHERE l_orderkey < 100
)
UNPIVOT (value FOR metric IN (quantity, extendedprice, discount))
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): three measure columns become
    (metric, value) rows. Map-side row fan-out only — no shuffle, no
    generator; Spark compiles unpivot to an Expand node (each input row
    emits 3 output rows in place), so it scales linearly at any width."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "value",
    )


@query("agg_sketch_rollup", family="aggregations", oracle=None)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-nation HLL sketches of the customer
    set, MERGED (not recomputed) into per-region estimates.

    This is the pattern that makes 100 TB rollup hierarchies cheap:
    the expensive pass builds one sketch per leaf cell once; every
    coarser level is a sketch-union over the (tiny) sketch column —
    no second scan of the fact data, and sketch merge is associative
    so it parallelizes like a sum. exact_custs rides along to expose
    estimator error (pytest gates it at ±5%; rows-only for the driver
    since HLL implementations differ across engines).
    """
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    leaf = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sketch"),
            F.countDistinct("c_custkey").alias("exact_custs"),
        )
    )
    return (
        leaf.groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch")
            ).cast("long").alias("approx_custs"),
            F.sum("exact_custs").alias("exact_custs"),  # custkeys are
            # globally unique, so the leaf-exact counts sum exactly
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_approx_quantile",
    family="aggregations",
    tags=("rows-only",),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) per group — the
    mergeable single-pass quantile path for 100 TB rollups (exact
    percentile needs a per-group sort; the sketch is one scan and
    merges across partitions). Rows-only: sketch internals differ
    across engines; pytest gates the rank error vs the exact
    percentile instead (accuracy 10000 ⇒ rank error ≤ n/10000)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            q.getItem(0).alias("q25"),
            q.getItem(1).alias("q50"),
            q.getItem(2).alias("q75"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_minmax_by",
    family="aggregations",
    oracle="""
SELECT n_nationkey AS nationkey,
       max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000000 + c_custkey) AS richest,
       min_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000000 + c_custkey) AS poorest,
       CAST(max(round(c_acctbal * 100)) / 100.0 AS DOUBLE) AS max_bal,
       CAST(min(round(c_acctbal * 100)) / 100.0 AS DOUBLE) AS min_bal,
       count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_nationkey
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin): per nation, the customer name at
    the extreme account balance. The ordering key is a composite exact
    BIGINT — round(acctbal*100) (balances are 2dp-generated, so this is
    the exact cent value) shifted left of the unique custkey — making
    ties impossible and the winner identical across engines. At scale
    this is one partial-aggregating shuffle: each partition ships one
    (key, value) champion per group. (Spark plans string-valued
    aggregation buffers as SortAggregate — same as max(string) — so
    the partial pass sorts each partition by the tiny group key; the
    shuffle still carries only champions.)"""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    key = (
        F.round(F.col("c_acctbal") * 100).cast("long") * F.lit(10_000_000_000)
        + F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nationkey"))
        .agg(
            F.max_by("c_name", key).alias("richest"),
            F.min_by("c_name", key).alias("poorest"),
            (F.max(F.round(F.col("c_acctbal") * 100)) / 100.0)
            .cast("double")
            .alias("max_bal"),
            (F.min(F.round(F.col("c_acctbal") * 100)) / 100.0)
            .cast("double")
            .alias("min_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "agg_bool",
    family="aggregations",
    oracle="""
SELECT o_orderpriority AS priority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       bool_and(o_orderstatus IN ('O','F','P')) AS all_known_status,
       bool_or(o_orderdate < TIMESTAMP '1993-01-01 00:00:00') AS any_pre_93,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or ≡ SQL EVERY / ANY):
    predicate summaries per group. Short-circuitable partial aggregation
    — a partition that has already seen a false for bool_and contributes
    a single boolean to the shuffle, nothing rescans."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.bool_and(F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "all_known_status"
        ),
        F.bool_or(
            F.col("o_orderdate") < F.lit("1993-01-01").cast("timestamp")
        ).alias("any_pre_93"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_listagg",
    family="aggregations",
    oracle="""
SELECT c_mktsegment AS segment,
       string_agg(c_name, '|' ORDER BY c_name) AS names,
       count(*) AS n
FROM customer
WHERE c_custkey % 100 = 0
GROUP BY c_mktsegment
""",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG/string_agg): names concatenated per
    group, ORDER BY inside the aggregate for determinism. Spark builds
    it as sort_array(collect_list(...)) + array_join — same partial-
    collect shuffle shape as agg_collect. The % 100 prefilter keeps the
    output strings bounded (a full string_agg over a 100 TB group is an
    anti-pattern; bounded-group or top-k-per-group is the scale form)."""
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") % 100 == 0)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias(
                "names"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_histogram",
    family="aggregations",
    oracle="""
SELECT bucket,
       CAST(bucket * 50000 AS DOUBLE) AS bucket_lo,
       count(*) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS total
FROM (SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, o_totalprice
      FROM orders)
GROUP BY bucket
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(x / width) — the
    distributed histogram primitive (width_bucket without endpoints).
    One map-side-combined shuffle keyed by ~20 buckets; the double
    division is the same IEEE op in both engines so bucket assignment
    is bit-deterministic."""
    o = t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("o_totalprice")).alias("total"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000).cast("double").alias("bucket_lo"),
            "n",
            "total",
        )
    )


@query(
    "agg_funnel",
    family="aggregations",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            ELSE 1 END AS stage
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
""",
)
def agg_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): per user,
    the earliest event of each stage that strictly FOLLOWS the previous
    stage, plus the deepest stage reached — the canonical product-
    analytics rollup. Three per-user aggregates chained by joins; every
    shuffle is on user_id, so Spark reuses the same hash partitioning
    across all stages (ENSURE_REQUIREMENTS inserts no extra exchange).
    min(timestamp) is order-insensitive, so the funnel is deterministic
    at any parallelism."""
    e = t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .alias("stage"),
        )
    )


@query(
    "agg_bitmap_distinct",
    family="aggregations",
    oracle="""
SELECT c_mktsegment AS segment,
       bit_or(1::BIGINT << c_nationkey) AS nation_bitmap,
       CAST(bit_count(bit_or(1::BIGINT << c_nationkey)) AS INT)
           AS n_distinct_nations,
       count(DISTINCT c_nationkey) AS n_distinct_check
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-aggregate exact distinct count for a SMALL-domain key
    (nationkey < 64): each row contributes one bit, bit_or folds them,
    popcount reads the cardinality. Unlike count(DISTINCT x) — which
    plans a two-phase expanded aggregate — the bitmap is a plain
    8-byte partial-aggregating fold: one shuffle of one long per
    group, mergeable at any tree depth (the same pattern roaring
    bitmaps scale to larger domains; the built-in count(DISTINCT)
    rides along as the cross-check)."""
    c = t(spark, sf_dir, "customer")
    # F.shiftleft only takes a literal bit count; the SQL form shifts
    # by a column
    bitmap = F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), c_nationkey)"))
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        bitmap.alias("nation_bitmap"),
        F.bit_count(bitmap).cast("int").alias("n_distinct_nations"),
        F.countDistinct("c_nationkey").alias("n_distinct_check"),
    )


@query(
    "agg_mode",
    family="aggregations",
    oracle="""
WITH c AS (
    SELECT l_returnflag, l_quantity, count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_quantity
)
SELECT l_returnflag,
       max_by(l_quantity,
              cnt * 1048576 - CAST(l_quantity * 100 AS BIGINT)) AS mode_qty,
       max(cnt) AS mode_count
FROM c
GROUP BY l_returnflag
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, smallest value on tie).

    Native ``mode()`` is tie-arbitrary in BOTH engines, so this uses
    the agg_minmax_by composite-key pattern instead: count the value
    frequencies, then argmax over an exact BIGINT key
    ``cnt * 2^20 - value_scaled`` — count dominates, the subtracted
    2dp-scaled value (< 2^20) breaks ties toward the SMALLEST value.
    Two partial-aggregating hash shuffles ((group, value), then group);
    no sort, no window — the shape that scales: a window-rank mode
    would sort every group, this folds.
    """
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    key = F.col("cnt") * F.lit(1048576) - F.round(
        F.col("l_quantity") * 100
    ).cast("long")
    return counts.groupBy("l_returnflag").agg(
        F.max_by("l_quantity", key).alias("mode_qty"),
        F.max("cnt").alias("mode_count"),
    )


@query(
    "agg_median",
    family="aggregations",
    oracle="""
SELECT l_linestatus,
       round(median(l_extendedprice), 6) AS median_price,
       round(median(l_quantity), 6) AS median_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_linestatus
""",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (interpolated at even cardinality).

    Both engines interpolate (a+b)/2 on the same sorted doubles —
    bit-identical, rounded 6 dp for safety. Exact medians need the
    group's values materialized per group (Spark plans ObjectHashAgg
    over a percentile buffer); at 100 TB prefer approx_percentile(0.5)
    (t-digest-ish sketch: one pass, mergeable, bounded memory) unless
    exactness is contractual — same trade agg_percentile documents.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.median("l_extendedprice"), 6).alias("median_price"),
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


_REGR_ORACLE = """
WITH xy AS (
  SELECT l_returnflag,
         CAST(l_quantity AS DECIMAL(18,6)) AS x,
         -- price floored to whole $ then expressed in k$: 3dp, so y*y
         -- is 6dp — EXACT at scale 6 (no rounding anywhere, and no
         -- rounding-mode divergence between engines); also keeps every
         -- moment inside both engines' int64 decimal fast path AND the
         -- exact decimal->double window
         CAST(CAST(floor(l_extendedprice) AS DECIMAL(18,0))
              * CAST(0.001 AS DECIMAL(9,3)) AS DECIMAL(18,6)) AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(CAST(sum(x) AS DECIMAL(28,6)) AS DOUBLE) AS sx,
         CAST(CAST(sum(x * x) AS DECIMAL(28,6)) AS DOUBLE) AS sxx,
         CAST(CAST(sum(y) AS DECIMAL(28,6)) AS DOUBLE) AS sy,
         CAST(CAST(sum(y * y) AS DECIMAL(28,6)) AS DOUBLE) AS syy,
         CAST(CAST(sum(x * y) AS DECIMAL(28,6)) AS DOUBLE) AS sxy
  FROM xy GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS regr_n,
       (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
       sy/n - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * (sx/n) AS intercept,
       ((n*sxy - sx*sy) * (n*sxy - sx*sy))
           / ((n*sxx - sx*sx) * (n*syy - sy*sy)) AS r2,
       sx/n AS mean_x,
       sy/n AS mean_y
FROM m ORDER BY l_returnflag
"""


@query("agg_regr", family="aggregations", oracle=_REGR_ORACLE)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (REGR_SLOPE / REGR_INTERCEPT /
    REGR_R2 / REGR_AVGX / REGR_AVGY): price-on-quantity OLS per return
    flag, price floored to whole dollars, in k$. Same exact-moment discipline as
    agg_stats — built-in regr_* are order-sensitive double folds, so
    the moments Σx Σx² Σy Σy² Σxy accumulate as exact decimals and the
    estimators derive in closed form with IEEE-exact double ops,
    bit-identical to the oracle's identical formula. The k$ rescale is
    load-bearing twice: y² stays inside the int64 decimal fast path of
    both engines, and Σy² ≤ ~1e4·rows stays inside the exact
    DECIMAL(28,6)→double window (<9e9) through sf0.1 (widen the window
    check before sf10).

    Scale: one partial+final hash aggregate on a 3-value key; the six
    moments are the whole shuffle payload (48 bytes/group/task).
    """
    li = t(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = (
        F.floor("l_extendedprice").cast("decimal(18,0)")
        * F.lit("0.001").cast("decimal(9,3)")
    ).cast("decimal(18,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("decimal(28,6)").cast("double").alias("sx"),
        F.sum(x * x).cast("decimal(28,6)").cast("double").alias("sxx"),
        F.sum(y).cast("decimal(28,6)").cast("double").alias("sy"),
        F.sum(y * y).cast("decimal(28,6)").cast("double").alias("syy"),
        F.sum(x * y).cast("decimal(28,6)").cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        n.alias("regr_n"),
        slope.alias("slope"),
        (sy / n - slope * (sx / n)).alias("intercept"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
        (sx / n).alias("mean_x"),
        (sy / n).alias("mean_y"),
    ).orderBy("l_returnflag")


@query(
    "agg_approx_topk",
    family="aggregations",
    oracle="""
    SELECT event_type AS item, count(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters (``approx_top_k``, Spark 4): the
    sketch-based answer to "top k most frequent values" that never
    materializes the full distinct domain. k is set to cover the whole
    event_type domain and the sketch's tracked capacity (default
    10,000) exceeds the cardinality, so the sketch operates in its
    EXACT regime and the result set equals the plain GROUP BY count —
    which is precisely what the oracle checks. The approximate regime
    (capacity < cardinality) trades that equality for fixed memory;
    at 100 TB the sketch is the only viable plan for open-domain keys
    (URLs, tokens): one partial sketch per task merges to a single
    k-row result, vs a full-domain hash aggregate whose state is the
    domain size. Output is exploded to scalar (item, cnt) rows for
    driver-canon safety.
    """
    e = t(spark, sf_dir, "events")
    sketch = e.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return sketch.select(F.explode("tk").alias("kv")).select(
        F.col("kv.item").alias("item"),
        F.col("kv.count").alias("cnt"),
    )


_WELCH_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS grp,
         count(*) AS n,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sx,
         CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0)) * CAST(0.001 AS DECIMAL(9,3)) AS DECIMAL(18,6)))
              AS DECIMAL(28,6)) AS DOUBLE) AS sfx_k,
         -- price floored to whole $ then k$: 3dp, so the square is 6dp
         -- — exact at scale 6, no rounding-mode divergence (cf. agg_regr)
         CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0)) * CAST(0.001 AS DECIMAL(9,3)) AS DECIMAL(18,6))
                       * CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0)) * CAST(0.001 AS DECIMAL(9,3)) AS DECIMAL(18,6)))
              AS DECIMAL(28,6)) AS DOUBLE) AS sxx_k
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_orderpriority
),
s AS (
  SELECT grp, n, sx / n AS mean,
         -- variance of price in k$ from exact k$^2 moments, rescaled
         ((sxx_k - sfx_k * sfx_k / n) / (n - 1)) * 1000000.0 AS var
  FROM m
)
SELECT a.n AS n_urgent, b.n AS n_low,
       a.mean AS mean_urgent, b.mean AS mean_low,
       (a.mean - b.mean)
         / sqrt(a.var / a.n + b.var / b.n) AS t_stat,
       (a.var / a.n + b.var / b.n) * (a.var / a.n + b.var / b.n)
         / ((a.var / a.n) * (a.var / a.n) / (a.n - 1)
            + (b.var / b.n) * (b.var / b.n) / (b.n - 1)) AS welch_df
FROM (SELECT * FROM s WHERE grp = '1-URGENT') a
CROSS JOIN (SELECT * FROM s WHERE grp = '5-LOW') b
"""


@query("agg_welch_t", family="aggregations", oracle=_WELCH_ORACLE)
def agg_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances): does mean order
    value differ between URGENT and LOW priority orders? Statistic and
    Welch–Satterthwaite degrees of freedom in closed form from
    exact-decimal moments (n, Σx, Σx², with the variance over whole-dollar-floored k$ values) — the agg_stats/agg_regr
    numeric discipline applied to hypothesis testing; the p-value
    lookup (incomplete beta) is a client-side constant-time step and
    deliberately out of scope (neither engine ships it). Σx² uses the
    k$ rescale (values ≤ ~600 k$ ⇒ squares ≤ 3.6e5) so the second
    moment stays exact through sf10; the variance rescales back by
    10⁶ — an exact power-of-ten double multiply.

    Scale: one partial+final aggregate over the filtered scan (the
    priority predicate pushes down), then a 2-row self-pair — the
    whole test is one scan regardless of data size.
    """
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    price_k = (
        F.floor("o_totalprice").cast("decimal(18,0)")
        * F.lit("0.001").cast("decimal(9,3)")
    ).cast("decimal(18,6)")
    m = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("decimal(28,6)").cast("double").alias("sx"),
        F.sum(price_k).cast("decimal(28,6)").cast("double").alias("sfx_k"),
        F.sum(price_k * price_k).cast("decimal(28,6)").cast("double").alias("sxx_k"),
    )
    s = m.select(
        "grp",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        (
            (F.col("sxx_k") - F.col("sfx_k") * F.col("sfx_k") / F.col("n"))
            / (F.col("n") - 1)
            * F.lit(1000000.0)
        ).alias("var"),
    )
    a = s.filter(F.col("grp") == "1-URGENT").alias("a")
    b = s.filter(F.col("grp") == "5-LOW").alias("b")
    va_n = F.col("a.var") / F.col("a.n")
    vb_n = F.col("b.var") / F.col("b.n")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_urgent"),
        F.col("b.n").alias("n_low"),
        F.col("a.mean").alias("mean_urgent"),
        F.col("b.mean").alias("mean_low"),
        ((F.col("a.mean") - F.col("b.mean")) / F.sqrt(va_n + vb_n)).alias("t_stat"),
        (
            (va_n + vb_n)
            * (va_n + vb_n)
            / (va_n * va_n / (F.col("a.n") - 1) + vb_n * vb_n / (F.col("b.n") - 1))
        ).alias("welch_df"),
    )


_CHI2_ORACLE = """
WITH o AS (
  SELECT c_mktsegment AS seg, n_name AS nat, count(*) AS obs
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM o),
rows_ AS (SELECT seg, CAST(sum(obs) AS DOUBLE) AS rt FROM o GROUP BY seg),
cols_ AS (SELECT nat, CAST(sum(obs) AS DOUBLE) AS ct FROM o GROUP BY nat),
cells AS (
  SELECT o.seg, o.nat, o.obs, rows_.rt * cols_.ct / tot.n AS exp
  FROM o JOIN rows_ USING (seg) JOIN cols_ USING (nat) CROSS JOIN tot
),
folded AS (
  SELECT list((obs - exp) * (obs - exp) / exp ORDER BY seg, nat) AS terms,
         count(*) AS n_cells
  FROM cells
)
SELECT round(list_sum(terms), 6) AS chi2,
       CAST((SELECT count(DISTINCT seg) FROM o) - 1 AS BIGINT)
         * CAST((SELECT count(DISTINCT nat) FROM o) - 1 AS BIGINT) AS dof,
       CAST(n_cells AS BIGINT) AS n_cells
FROM folded
"""


@query("agg_chi2", family="aggregations", oracle=_CHI2_ORACLE)
def agg_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence: is customer market segment
    independent of nation? χ² = Σ (obs − exp)²/exp over the
    contingency table, expected counts from the row/column marginals.
    Everything derives from integer counts, so each cell term is the
    identical double arithmetic in both engines; the cell terms sum in
    (seg, nation) ORDER via the sequential-fold policy (a tiny
    contingency-table-sized array), then round 6 — no tolerance.

    Scale: one count aggregate over the broadcast-dim join builds the
    table; marginals re-aggregate the TABLE (segments × nations rows),
    never the data — at 100 TB the second pass is over dozens of rows.
    """
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    o = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat"))
        .agg(F.count(F.lit(1)).alias("obs"))
        .persist()
    )
    tot = o.agg(F.sum("obs").cast("double").alias("n"))
    rows_ = o.groupBy("seg").agg(F.sum("obs").cast("double").alias("rt"))
    cols_ = o.groupBy("nat").agg(F.sum("obs").cast("double").alias("ct"))
    cells = (
        o.join(rows_, "seg")
        .join(cols_, "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "nat",
            "obs",
            (F.col("rt") * F.col("ct") / F.col("n")).alias("exp"),
        )
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(seg, nat, "
        "(obs - exp) * (obs - exp) / exp AS term))), s -> s.term), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    ndist = o.agg(
        F.countDistinct("seg").alias("n_seg"), F.countDistinct("nat").alias("n_nat")
    )
    chi = cells.agg(
        F.round(F.expr(fold), 6).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return chi.crossJoin(F.broadcast(ndist)).select(
        "chi2",
        ((F.col("n_seg") - 1) * (F.col("n_nat") - 1)).alias("dof"),
        "n_cells",
    )


_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders
  WHERE o_totalprice >= 1
),
obs AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM obs)
SELECT obs.digit,
       CAST(obs.n AS BIGINT) AS n,
       obs.n / tot.total AS observed_p,
       ln(1.0 + 1.0 / obs.digit) / ln(10.0) AS benford_p,
       (obs.n / tot.total - ln(1.0 + 1.0 / obs.digit) / ln(10.0))
         * (obs.n / tot.total - ln(1.0 + 1.0 / obs.digit) / ln(10.0))
         / (ln(1.0 + 1.0 / obs.digit) / ln(10.0)) * tot.total AS chi2_term
FROM obs CROSS JOIN tot
ORDER BY obs.digit
"""


@query("agg_benford", family="aggregations", oracle=_BENFORD_ORACLE)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic fraud/anomaly screen for financial columns: observed
    first-significant-digit frequencies against the Benford expectation
    log10(1 + 1/d), with the per-digit chi-square contribution (sum the
    column client-side for the 8-dof statistic). First digit extracted
    lexically from the floored integer (exact — no float log10 edge
    cases at powers of ten); probabilities are identical count-ratio
    and ln arithmetic in both engines.

    Scale: one partial+final aggregate on a 9-value key + a 1-row
    total broadcast — the audit costs one scan at any size.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").cast("double").alias("total"))
    p = F.col("n") / F.col("total")
    bp = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            p.alias("observed_p"),
            bp.alias("benford_p"),
            ((p - bp) * (p - bp) / bp * F.col("total")).alias("chi2_term"),
        )
        .orderBy("digit")
    )


_GINI_ORACLE = """
WITH ranked AS (
    SELECT n_name,
           CAST(c_acctbal AS DECIMAL(18,6)) AS bal,
           row_number() OVER (PARTITION BY n_name
                              ORDER BY c_acctbal, c_custkey) AS rk,
           count(*) OVER (PARTITION BY n_name) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal >= 0
)
SELECT n_name AS nation,
       CAST(max(n) AS BIGINT) AS n_custs,
       CAST(CAST(sum(bal * (2 * rk - n - 1)) AS DECIMAL(38,6)) AS DOUBLE)
           / (max(n) * CAST(CAST(sum(bal) AS DECIMAL(38,6)) AS DOUBLE))
           AS gini
FROM ranked
GROUP BY n_name
ORDER BY n_name
"""


@query("agg_gini", family="aggregations", oracle=_GINI_ORACLE)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of (non-negative) customer
    account balances per nation — the inequality metric, via the
    rank formula G = Σ bal·(2·rank − n − 1) / (n · Σ bal). Ranks are
    a total order (balance, custkey tiebreak ⇒ deterministic at any
    parallelism); both numerator and denominator accumulate in exact
    DECIMAL (bal·integer stays scale-6), cast to double only for the
    final division — bit-identical across engines.

    Plan: one shuffle on nation for the rank window; the aggregate
    reuses the same partitioning. The weighted-rank form needs ONE
    sorted pass, vs the naive all-pairs |x_i − x_j| definition which
    is quadratic — the 100 TB reason this formula exists.
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    nat = t(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    w = Window.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    ranked = j.select(
        "n_name",
        dec("c_acctbal").alias("bal"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("n_name")).alias("n"),
    )
    num = (
        F.sum(F.col("bal") * (2 * F.col("rk") - F.col("n") - 1))
        .cast("decimal(38,6)")
        .cast("double")
    )
    den = F.max("n") * F.sum("bal").cast("decimal(38,6)").cast("double")
    return (
        ranked.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").alias("n_custs"),
            (num / den).alias("gini"),
        )
        .orderBy("nation")
    )


_PARETO_ORACLE = """
WITH per_cust AS (
    SELECT o_custkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS rev
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT rev,
           row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
           count(*) OVER () AS n
    FROM per_cust
),
cum AS (
    SELECT CASE WHEN rk <= CAST(ceil(n * 0.10) AS BIGINT) THEN 'top10'
                WHEN rk <= CAST(ceil(n * 0.20) AS BIGINT) THEN 'next10'
                ELSE 'rest' END AS bucket,
           rev, n
    FROM ranked
)
SELECT bucket,
       count(*) AS n_custs,
       CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DECIMAL(28,6))
            AS DOUBLE) AS revenue,
       CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)
           / (SELECT CAST(CAST(sum(CAST(rev AS DECIMAL(18,6)))
                     AS DECIMAL(28,6)) AS DOUBLE) FROM per_cust)
           AS revenue_share
FROM cum
GROUP BY bucket
"""


@query("agg_pareto", family="aggregations", oracle=_PARETO_ORACLE)
def agg_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: revenue share of the top-10% / next-10% /
    remaining customers — the "80/20" audit that, with agg_gini, makes
    up the concentration toolkit. Customers rank by exact-decimal
    revenue with a custkey tiebreak (total order ⇒ deterministic
    bucket edges at any parallelism); per-customer revenues are exact
    decimal-valued doubles, so re-summing them per bucket through the
    DECIMAL fold is order-insensitive and the shares divide identical
    doubles.

    Scale: one shuffle to aggregate per customer; the exact rank over
    the per-customer aggregate comes from ``ordered_prefix`` (range
    partitions + broadcast offsets — a bare rank window would push
    every customer through ONE task, VERDICT r3 #2d); the customer
    count rides along free, so the bucket edges are plain literals;
    bucket-sized final aggregate + 1-row total broadcast.
    """
    o = t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum(dec("o_totalprice")).alias("rev"))
    ranked, n = ordered_prefix(
        per_cust, [F.desc("rev"), "o_custkey"], rank_col="rk"
    )
    c_top = math.ceil(n * 0.10)
    c_next = math.ceil(n * 0.20)
    bucket = (
        F.when(F.col("rk") <= F.lit(c_top), "top10")
        .when(F.col("rk") <= F.lit(c_next), "next10")
        .otherwise("rest")
    )
    total = ranked.agg(dsum(dec("rev")).alias("total_rev"))
    return (
        ranked.select(bucket.alias("bucket"), "rev")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(dec("rev")).alias("revenue"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n_custs",
            "revenue",
            (F.col("revenue") / F.col("total_rev")).alias("revenue_share"),
        )
    )


@query("agg_count_min_sketch", family="aggregations", oracle=None)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min sketch frequency estimation over event types: ONE
    mergeable fixed-size sketch (ε=0.001, δ=0.99) summarizes the whole
    stream, then each type's estimated frequency is read from it next
    to the exact count — the heavy-hitter primitive whose partials
    merge associatively across 100 TB partitions while the exact
    groupBy carries a full shuffle.

    The sketch binary is MODEL-sized (w·d counters, independent of
    data volume): deserializing it driver-side to answer point queries
    is the intended use, not a collect() anti-pattern. CMS guarantees
    estimate ≥ exact, and ≤ exact + ε·N with probability δ —
    pytest pins both bounds (rows-only: sketch internals are
    seed/implementation-specific, not SQL-expressible).
    """
    e = t(spark, sf_dir, "events")
    row = e.agg(
        F.count_min_sketch(
            "event_type", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("cms"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(row["cms"]))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    exact = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    est = {
        r["event_type"]: cms.estimateCount(r["event_type"])
        for r in exact.select("event_type").collect()
    }
    est_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in est.items() for x in kv]
        ),
        F.col("event_type"),
    )
    return exact.select(
        "event_type",
        "exact_n",
        est_col.cast("bigint").alias("cms_estimate"),
        F.lit(int(row["n"])).cast("bigint").alias("stream_total"),
    ).orderBy("event_type")


MG_COUNTERS = 50  # Misra–Gries counters per partition


@query(
    "agg_heavy_hitters",
    family="aggregations",
    oracle=f"""
    WITH tok AS (
        SELECT t.word
        FROM documents, unnest(string_split(text, ' ')) AS t(word)
        WHERE t.word <> ''
    ),
    tot AS (SELECT count(*) AS n FROM tok),
    cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
            FROM tok GROUP BY word)
    SELECT word, freq
    FROM cnt, tot
    WHERE freq * {MG_COUNTERS} > n
    ORDER BY freq DESC, word
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over document words, production
    two-pass shape: pass 1 is the bounded-memory MG sketch (each
    partition maintains MG_COUNTERS counters across its Arrow batches
    inside ONE mapInPandas pass — state lives in the generator,
    partition-local, never driver-side); pass 2 exactly recounts ONLY
    the surviving candidates (broadcast semi-join) and keeps words
    whose exact frequency exceeds N/MG_COUNTERS.

    Completeness is the classic MG merge argument: if a word's global
    frequency exceeds N/k, then on at least one partition its local
    frequency exceeds n_p/k (averaging), so it survives that
    partition's counters and enters the candidate set — the recount
    therefore misses nothing. The output is EXACT counts, independent
    of partition layout ⇒ SQL-oracled (a plain filtered word count),
    unlike the one-pass variant whose bounds are layout-dependent.

    At 100 TB: two corpus scans, but the shuffle carries only
    candidate words (≤ #partitions × MG_COUNTERS distinct keys,
    model-sized broadcast) instead of the full vocabulary — the
    standard sketch-then-verify trade. Per-executor memory is
    O(MG_COUNTERS).
    """
    import pandas as pd  # noqa: F401 (executors re-import the module)

    docs = t(spark, sf_dir, "documents").select("text")

    # k binds as a DEFAULT ARG: executors re-import this module, so a
    # bare global reference would ignore a test's monkeypatched value
    # (the queries/udfs.py module-level-UDF gotcha, same mechanism)
    def mg_partition(batches, k=MG_COUNTERS):
        import pandas as pd

        counters: dict[str, int] = {}
        n_tokens = 0
        for pdf in batches:
            for text in pdf["text"]:
                for w in str(text).split(" "):
                    if not w:
                        continue
                    n_tokens += 1
                    if w in counters:
                        counters[w] += 1
                    elif len(counters) < k:
                        counters[w] = 1
                    else:
                        for key in list(counters):
                            counters[key] -= 1
                            if counters[key] == 0:
                                del counters[key]
        # survivors + ONE word=NULL row carrying the partition's token
        # total (separate nullable key, no in-band sentinel word)
        yield pd.DataFrame(
            {
                "word": list(counters) + [None],
                "est": list(counters.values()) + [n_tokens],
            }
        )

    import pyspark.sql.types as T

    # persist: candidates and the token total both read the summaries
    summaries = docs.mapInPandas(
        mg_partition, schema=T.StructType(
            [
                T.StructField("word", T.StringType()),
                T.StructField("est", T.LongType()),
            ]
        )
    ).persist()
    candidates = summaries.filter(F.col("word").isNotNull()).select("word").distinct()
    n_total = summaries.filter(F.col("word").isNull()).agg(
        F.sum("est").cast("bigint").alias("n")
    )
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    k = MG_COUNTERS
    return (
        tok.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("freq") * k > F.col("n"))
        .select("word", "freq")
        .orderBy(F.desc("freq"), "word")
    )


@query(
    "agg_lorenz",
    family="aggregations",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
        FROM per
    ),
    dec AS (
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(sum(cents) AS BIGINT) AS dec_cents,
               CAST(count(*) AS BIGINT) AS n_custs
        FROM ranked GROUP BY 1
    )
    SELECT decile, n_custs,
           round(CAST(dec_cents AS DOUBLE) / 100, 6) AS decile_revenue,
           round(CAST(sum(dec_cents) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / (SELECT CAST(sum(dec_cents) AS DOUBLE) FROM dec), 6)
               AS cum_share
    FROM dec
    """,
)
def agg_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve deciles of per-customer revenue: customers rank
    ascending by spend, split into 10 rank deciles, and each decile
    reports its revenue plus the CUMULATIVE share — the curve whose
    area defect agg_gini summarizes to one number and whose top-heavy
    tail agg_pareto reads off ("the bottom 50% hold 21% of revenue" is
    a Lorenz point). Completes the concentration toolkit with the
    inspectable-by-decile form.

    Determinism: per-customer revenue in exact integer cents; a TOTAL
    rank order (cents, custkey); exact ntile decile assignment from
    the rank; BIGINT decile sums; the cumulative share is one division
    of exact ints per decile. Scale: one customer-keyed aggregate +
    _util.ordered_prefix for the global rank AND the inclusive running
    revenue sum — range-partitioned, NEVER a single-task window (the
    oracle's global windows are fine in DuckDB; the Spark side must
    survive a billion customers). The decile's cumulative revenue is
    the running sum at its LAST row (max of the inclusive prefix), so
    no second pass is needed.
    """
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked, n = ordered_prefix(
        per,
        [F.col("cents"), F.col("o_custkey")],
        rank_col="rn",
        prefix=(("cents", "sum", "cum_cents"),),
    )
    dec_t = (
        ranked.groupBy(
            _ntile_from_rank("rn", n, 10).cast("bigint").alias("decile")
        )
        .agg(
            F.sum("cents").cast("bigint").alias("dec_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            F.max("cum_cents").cast("bigint").alias("cum_at_end"),
        )
        .persist()
    )
    total = dec_t.agg(F.max("cum_at_end").cast("double").alias("tot"))
    return (
        dec_t.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_custs",
            F.round(F.col("dec_cents").cast("double") / 100, 6).alias(
                "decile_revenue"
            ),
            F.round(
                F.col("cum_at_end").cast("double") / F.col("tot"), 6
            ).alias("cum_share"),
        )
    )
