"""Scale-pattern joins (SURVEY.md §2.4-D extensions): bucketing and
salting — the two techniques that decide whether a 100 TB join runs.

Both queries return results identical to their plain-join equivalents
(the oracle is the PLAIN SQL join), because bucketing and salting are
physical-plan strategies, not semantics. The plan-shape tests assert
the physical property each one buys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

N_BUCKETS = 8
N_SALTS = 8


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem/orders as bucketed+sorted tables once per (session,
    sf). Bucket metadata lives in the session catalog; the bucketed
    layout is what a 100 TB deployment bakes in at WRITE time so every
    subsequent orderkey join is shuffle-free.
    """
    import shutil

    tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    li_name = f"lineitem_b{tag}"
    o_name = f"orders_b{tag}"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in (li_name, o_name):
        # the in-memory catalog dies with the session but the warehouse
        # dir does not — clear orphaned locations from prior sessions
        if not spark.catalog.tableExists(name):
            shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    if not spark.catalog.tableExists(li_name):
        (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity", "l_extendedprice")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_name)
        )
    if not spark.catalog.tableExists(o_name):
        (
            t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderdate", "o_orderpriority")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    return li_name, o_name


@query(
    "join_bucketed",
    family="joins",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketed tables.

    Both sides are bucketed+sorted on the join key at write time, so
    the SortMergeJoin consumes buckets directly — the plan has NO
    Exchange on either side (asserted in test_plan_shape). At 100 TB
    this converts the largest shuffle in the workload into a pure
    map-side merge.
    """
    li_name, o_name = _ensure_bucketed(spark, sf_dir)
    li, o = spark.table(li_name), spark.table(o_name)
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("revenue"),
    )


@query(
    "join_skew_salted",
    family="joins",
    oracle="""
    SELECT n_name, count(*) AS n,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted join: identical result, skew-proof plan.

    The hot-key hazard: a shuffle join partitions by key, so one hot
    key = one straggler task. Salting splits every big-side key into
    N_SALTS sub-keys via a hash of a row-unique column (deterministic —
    no rand(), which would break retry idempotence and oracle parity)
    and replicates the small side N_SALTS×. The join result is
    provably identical to the plain join, which is exactly what the
    oracle checks. AQE's skew-join handles the same problem adaptively
    at shuffle time; manual salting is the write-it-down version that
    also works for aggregations and non-AQE engines — the join here is
    forced to shuffle (broadcast disabled via hint bypass: the salted
    key is the join key) only conceptually; at this SF Spark may still
    broadcast, and that is fine: the salt columns simply ride along.
    """
    cust = t(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.xxhash64("c_custkey"), F.lit(N_SALTS)).cast("int")
    )
    nation = (
        t(spark, sf_dir, "nation")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])))
    )
    joined = cust.join(
        nation,
        (cust.c_nationkey == nation.n_nationkey) & (cust.salt == nation.salt),
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("total_bal"),
    )


@query(
    "join_range_banded",
    family="joins",
    oracle="""
SELECT p.event_id AS purchase_id,
       count(*) AS n_clicks_1h
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
GROUP BY p.event_id
""",
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via time-banding: clicks within the hour before
    each purchase.

    A naive range join is BroadcastNestedLoopJoin — O(|L|x|R|) compares
    and only viable while one side broadcasts. Banding turns it into an
    EQUI-join: each click keys by its hour band; each purchase probes
    its own band and the previous one (a 1-hour lookback spans at most
    2 hour bands). Spark then picks hash/sort-merge on the band key and
    the residual range filter touches only same-band candidates —
    shuffle-partitionable on both sides, no broadcast requirement, so
    it survives two 100 TB inputs. Cost model: compares drop from
    |L|x|R| to sum over bands of |L_band|x|R_band|; band width tunes
    the tradeoff (width ~ range span keeps the probe fan-out at 2).
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"),
        F.date_trunc("hour", "ts").alias("band"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("ts").alias("p_ts"),
        F.explode(
            # array_distinct: the two probe bands coincide for
            # on-the-hour purchases — dedup map-side, NOT with a
            # .distinct() (which would add a whole shuffle)
            F.array_distinct(
                F.array(
                    F.date_trunc("hour", "ts"),
                    F.date_trunc(
                        "hour", F.col("ts") - F.expr("INTERVAL 1 HOUR")
                    ),
                )
            )
        ).alias("band"),
    )
    return (
        purchases.join(clicks, "band")
        .filter(
            (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts"))
        )
        .groupBy(F.col("event_id").alias("purchase_id"))
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
    )


_REV_SQL = (
    "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))"
    " * CAST(1 - l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)"
)


def _ensure_partitioned_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem partitioned by ship_year once per (warehouse, sf).

    This is the layout a 100 TB deployment bakes in at WRITE time:
    facts partitioned by their dominant time key, so any time-bounded
    read — static OR runtime-pruned — skips whole directories instead
    of filtering rows.
    """
    import os

    tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    path = f"{warehouse}/lineitem_byyear_{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        (
            t(spark, sf_dir, "lineitem")
            .withColumn("ship_year", F.year("l_shipdate").cast("int"))
            .write.partitionBy("ship_year")
            .mode("overwrite")
            .parquet(path)
        )
    return path


@query(
    "join_dpp",
    family="joins",
    oracle=f"""
    WITH yr AS (
      SELECT CAST(extract(YEAR FROM o_orderdate) AS INT) AS yr
      FROM orders
      GROUP BY 1
      HAVING count(DISTINCT date_trunc('month', o_orderdate)) = 12
    )
    SELECT yr, count(*) AS n_lines, {_REV_SQL} AS revenue
    FROM lineitem
    JOIN yr ON CAST(extract(YEAR FROM l_shipdate) AS INT) = yr
    GROUP BY yr
    """,
)
def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: fact partitions skipped at RUNTIME by
    a dim-side filter the optimizer cannot evaluate statically.

    The fact (lineitem, written partitioned by ship_year) joins a tiny
    derived year dim filtered on a non-key attribute — "years with a
    full 12 months of orders" (drops the partial boundary year). No
    static rule can turn that into a partition predicate; Spark's DPP
    reuses the dim's broadcast exchange as a subquery filter on the
    fact scan, so the pruned years' directories are never read
    (PartitionFilters: dynamicpruningexpression(...), asserted in
    test_plan_shape). At 100 TB this is THE difference between
    scanning 7 years and scanning 6 — per query, for free, with the
    same one-broadcast-join plan. The oracle is the equivalent
    unpartitioned SQL join (pruning is physical, not semantic).
    """
    fact = spark.read.parquet(_ensure_partitioned_lineitem(spark, sf_dir))
    yr_dim = (
        t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.countDistinct(F.date_trunc("month", "o_orderdate")).alias("n_months")
        )
        .filter(F.col("n_months") == 12)
        .select("yr")
    )
    return (
        fact.join(F.broadcast(yr_dim), fact.ship_year == yr_dim.yr)
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,6)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
            )
            .cast("decimal(28,6)")
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "join_fuzzy",
    family="joins",
    oracle="""
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a
    JOIN customer b
      ON a.c_name < b.c_name
     AND levenshtein(a.c_name, b.c_name) <= 1
    WHERE a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'BUILDING'
    """,
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join via SymSpell/FastSS mask-one-position blocking:
    all customer name pairs at edit distance ≤ 1, with ZERO recall
    loss and NO skew on templated data.

    Equal-length strings at distance ≤ 1 differ by exactly one
    substitution, so each name explodes into n "masked variants"
    (position i replaced by a sentinel); two names collide on a
    variant IFF they agree everywhere except the masked position —
    i.e. exactly the hamming ≤ 1 pairs, each colliding on exactly ONE
    key (no dedup pass needed). This beats half/part-split pigeonhole
    blocking, whose block sizes explode when the data shares long
    templated prefixes (measured: the naive L-half block degenerated
    to ALL names at sf0.1); masked variants are near-unique on ANY
    data because a collision already implies 17/18 characters agree.
    Cost: len× map-side expansion of short strings + one equi-join —
    linear, shuffle on short string keys; at 100 TB hash the variant
    to 8 bytes (xxhash64) to cut shuffle width (kept as strings here
    for oracle readability). Unequal-length pairs can't be ≤ 1 apart
    under substitution-only edits on this fixed-width corpus; general
    insert/delete support masks deletions too (full SymSpell),
    documented — parity with the oracle's UNRESTRICTED all-pairs
    levenshtein proves no cross-length pair exists at this threshold.
    The final levenshtein verify is defense-in-depth (and what the
    oracle states); it runs only on true near-matches.
    """
    # one segment's names: keeps the ORACLE's deliberate all-pairs
    # completeness proof quadratic-in-a-slice instead of in the corpus
    # (the engine-side blocking itself is linear and needs no filter)
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_name")
    )
    variants = c.select(
        "c_name",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(c_name)), i -> "
                "concat(substring(c_name, 1, i - 1), '\u0000', "
                "substring(c_name, i + 1, length(c_name))))"
            )
        ).alias("pos", "variant"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = a.join(
        b,
        (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.variant") == F.col("b.variant"))
        & (F.col("a.c_name") < F.col("b.c_name")),
    ).select(
        F.col("a.c_name").alias("name_a"),
        F.col("b.c_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return cand.filter(dist <= 1).select("name_a", "name_b", dist.alias("dist"))


# Conf pins for the runtime bloom-filter demo. The defaults gate the
# optimization to genuinely large scans (application side > 10 GB) and
# to joins the planner would not broadcast — at test SF both gates would
# suppress it, so the query pins them low, forces physical planning,
# then restores the session confs (the planned QueryExecution is cached
# on the returned DataFrame, so the later collect() reuses it).
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@query(
    "join_bloom",
    family="joins",
    oracle="""
    SELECT count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — DPP's sibling for
    NON-partition keys.

    A selective dim-side predicate (urgent orders) cannot prune the fact
    scan statically: ``l_orderkey`` is not a partition column, so every
    fact row normally travels through the shuffle before the join drops
    ~80% of them. Spark's ``InjectRuntimeFilter`` builds a bloom filter
    over the filtered creation side (``bloom_filter_agg`` subquery) and
    injects ``might_contain(l_orderkey)`` into the fact scan's filters,
    discarding non-matching rows BEFORE the exchange — at 100 TB that
    converts the dominant shuffle into one sized by the selectivity.
    Semantics are unchanged (bloom = no false negatives), which is
    exactly what the plain-SQL oracle checks; the plan-shape test pins
    the ``might_contain``/``bloom_filter_agg`` nodes.
    """
    from local_etl_spark.queries._util import dec, dsum

    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    out = (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            dsum(dec("l_extendedprice")).alias("revenue"),
        )
    )
    prev = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    try:
        # pins INSIDE the try: if a set() throws partway, the finally
        # still restores the already-applied ones (a leaked pin would
        # silently change planning for every later query in the session)
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        out._jdf.queryExecution().executedPlan()  # plan under pinned confs
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return out


INCIDENT_MIN_ERRORS = 2


@query(
    "join_interval_overlap",
    family="joins",
    oracle=f"""
    WITH a AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(ts) AS a_start, max(ts) AS a_end
        FROM events GROUP BY 1, 2
    ),
    b AS (
        SELECT CAST(ts AS DATE) AS day,
               date_trunc('hour', ts) AS b_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS b_end,
               count(*) AS n_err
        FROM events WHERE event_type = 'error'
        GROUP BY 1, 2, 3
        HAVING count(*) >= {INCIDENT_MIN_ERRORS}
    )
    SELECT a.user_id, a.day,
           count(*) AS n_incidents,
           CAST(sum(b.n_err) AS BIGINT) AS n_incident_errors
    FROM a JOIN b
      ON a.day = b.day
     AND a.a_start < b.b_end AND b.b_start <= a.a_end
    GROUP BY 1, 2
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join, banded: per-user daily activity
    spans [first event, last event] matched against error-incident
    hours (hours with ≥ INCIDENT_MIN_ERRORS errors) they overlap —
    'which users were active during an incident', the bread-and-butter
    correlation query of observability pipelines.

    Both interval sets nest inside a calendar day, so the day is an
    exact banding key: the join is an EQUI join on day with the
    two-sided overlap residual (a_start < b_end AND b_start <= a_end)
    as a post-filter — never a nested-loop interval scan (plan-pinned
    like join_range_banded). Scale: both sides pre-aggregate before
    the join (activity to user×day, incidents to qualifying hours), so
    the exchange carries summaries, not raw events; intervals spanning
    band boundaries generalize via the standard duplicate-into-both-
    bands + dedup trick (join_range_banded's docstring).
    """
    e = t(spark, sf_dir, "events")
    a = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("a_start"), F.max("ts").alias("a_end")
    )
    b = (
        e.filter(F.col("event_type") == "error")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.date_trunc("hour", "ts").alias("b_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= INCIDENT_MIN_ERRORS)
        .withColumn("b_end", F.col("b_start") + F.expr("INTERVAL 1 HOUR"))
    )
    j = a.join(
        b,
        (a.day == b.day)
        & (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")),
    )
    return j.groupBy(a.user_id, a.day).agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.sum("n_err").cast("bigint").alias("n_incident_errors"),
    )
