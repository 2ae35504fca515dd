"""Window-function queries (SURVEY.md §2.4-F).

Each window partitions on a real key so the physical plan is one
shuffle + partition-local sort — no global ordering anywhere. Order-by
keys always end in a unique column (orderkey/custkey) so every ranking
is a total order → deterministic vs the oracle.

Caching policy: day-series intermediates consumed by two branches
(win_zscore, win_interpolate) are persist()ed and not unpersisted in
the query fn — the returned DataFrame references them; the leak is
day-grid-sized and LRU-evicted (see llm_curation module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import dec, dsum, ordered_prefix, t
from local_etl_spark.registry import query
from local_etl_spark.streaming import core as stream_core


@query(
    "win_rank",
    family="windows",
    oracle="""
SELECT c_mktsegment AS segment, c_custkey AS custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per market segment."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "win_analytic",
    family="windows",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_orderdate AS orderdate,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS latest_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over each customer's order history. last_value
    needs the explicit unbounded-following frame (the default frame stops
    at CURRENT ROW in both engines — a classic window gotcha)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("orderdate"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("latest_order"),
    )


@query(
    "win_frame",
    family="windows",
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey, day_idx,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DECIMAL(28,6)) AS DOUBLE) AS running_spend,
       count(*) OVER (
         PARTITION BY o_custkey ORDER BY day_idx
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
       ) AS n_orders_30d
FROM (SELECT *, CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS day_idx
      FROM orders)
""",
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-frame running sum (exact decimal) + range-frame 30-day moving
    count over a numeric day index — the standard trick for time-range
    frames that stays inside native window exec."""
    o = t(spark, sf_dir, "orders").withColumn(
        "day_idx",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long"),
    )
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("day_idx"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("day_idx"),
        F.sum(dec("o_totalprice")).over(w_rows).cast("decimal(28,6)").cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w_range).alias("n_orders_30d"),
    )


@query(
    "win_dist",
    family="windows",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank + cume_dist. The
    (c_acctbal, c_custkey) ordering is unique per partition, so both
    ratios are deterministic integer-derived fractions (round 6dp is
    bit-stable across engines)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "win_ignore_nulls",
    family="windows",
    oracle="""
SELECT event_id, user_id,
       CASE WHEN event_type IN ('purchase','signup') THEN value END AS v,
       last_value(CASE WHEN event_type IN ('purchase','signup') THEN value END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       first_value(CASE WHEN event_type IN ('purchase','signup') THEN value END
                   IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_obs,
       nth_value(CASE WHEN event_type IN ('purchase','signup') THEN value END,
                 2 IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_obs
FROM events
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window family — last-observation-carried-forward
    (LOCF) gap-fill: only purchase/signup events carry a meaningful
    value; every row gets the latest one at-or-before it, plus the
    partition's first and second observations. The canonical sparse→
    dense sensor/feature fill, one window sort per user partition, no
    self-join. Ordering (ts, event_id) is unique, so the fill is
    deterministic; v is a raw double (no arithmetic), bit-identical
    across engines."""
    e = t(spark, sf_dir, "events")
    v = F.when(
        F.col("event_type").isin("purchase", "signup"), F.col("value")
    )
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return e.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.last(v, ignorenulls=True).over(running).alias("locf"),
        F.first(v, ignorenulls=True).over(full).alias("first_obs"),
        F.nth_value(v, 2, ignoreNulls=True).over(full).alias("second_obs"),
    )


@query(
    "win_range_interval",
    family="windows",
    oracle="""
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_trailing_1h,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(28,6)) AS DOUBLE)
           AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame over real timestamps: per user, the count
    and sum of events in the trailing hour — the native time-windowed
    running aggregate (no day-index trick needed; cf. win_frame). The
    frame is defined by the ORDER BY value, so timestamp ties get
    identical frames in both engines; the sum runs in exact DECIMAL
    (value is 2dp-generated) making accumulation order irrelevant.
    One shuffle on user_id, then a single sorted pass per partition."""
    e = t(spark, sf_dir, "events")
    e.createOrReplaceTempView("_win_range_events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               count(*) OVER w AS n_trailing_1h,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                    AS DECIMAL(28,6)) AS DOUBLE) AS sum_trailing_1h
        FROM _win_range_events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


@query(
    "win_match_recognize",
    family="windows",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               substr(event_type, 1, 1) AS ini,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT *, sum(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
        FROM g
    )
    SELECT user_id,
           CAST(sess AS BIGINT) AS sess,
           min(ts) AS sess_start,
           count(*) AS n_events,
           string_agg(ini, '' ORDER BY ts, event_id) AS seq,
           (string_agg(ini, '' ORDER BY ts, event_id)
              LIKE '%v%c%p%') AS converted
    FROM s
    GROUP BY user_id, sess
    """,
)
def win_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE emulation: sessionize per user (30-min gap via
    lag/flag/cumsum windows), render each session's ordered event
    sequence as a compact symbol string, and match the conversion
    pattern view→…→click→…→purchase with a subsequence LIKE — i.e.
    ``PATTERN (ANY* V ANY* C ANY* P ANY*)`` without the MATCH_RECOGNIZE
    clause (which Spark SQL lacks). The symbol-string technique is the
    general plan-ahead: ANY regex over per-row symbols becomes one
    regexp/LIKE on the aggregated string.

    Determinism: session order keys end in event_id (unique), so the
    sequence string is a total order; collect_list is made order-safe
    by sorting the (ts, event_id, symbol) structs IN the row
    (array_sort), never relying on collection order.

    Scale: one shuffle on user_id shared by both window passes and the
    final groupBy (same key ⇒ ENSURE_REQUIREMENTS adds no exchange);
    per-session strings are bounded by session length, not corpus
    size. A 100 TB run adds a watermark-style time bound per session
    (stream_session is the streaming twin of the sessionize stage).
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("ini"),
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.withColumn(
        "sess",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agg = sess.groupBy("user_id", "sess").agg(
        F.min("ts").alias("sess_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ini"))),
                lambda x: x["ini"],
            ),
            "",
        ).alias("seq"),
    )
    return agg.select(
        "user_id",
        "sess",
        "sess_start",
        "n_events",
        "seq",
        F.col("seq").like("%v%c%p%").alias("converted"),
    )


@query(
    "win_ewma",
    family="windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id,
               list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(xs) AS BIGINT) AS n_events,
           list_reduce(xs, (a, x) -> a * CAST(0.75 AS DOUBLE)
                                   + x * CAST(0.25 AS DOUBLE)) AS ewma
    FROM ordered
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (α = 0.25,
    seeded with the first observation) — the order-RECURSIVE aggregate
    no frame-based window can express (each step depends on the full
    prior fold, not a frame sum). Computed as an order-safe in-row
    sequential fold: sort (ts, event_id, value) structs IN the row,
    seed with x₀, fold eᵢ = 0.75·eᵢ₋₁ + 0.25·xᵢ. Both engines run the
    IDENTICAL multiply-add chain left-to-right (Spark ``aggregate``
    with the head as init ≡ DuckDB ``list_reduce`` seeding semantics),
    so the result is bit-identical with no tolerance — the same
    sequential-fold determinism policy as the embedding math
    (SCALE.md §5). α is the exact double 0.25 (a power of two), so
    1-α is exact too.

    Scale: one shuffle on user_id, then map-side folds; per-user state
    is one array bounded by the user's history (at 100 TB, window the
    history by time first — the fold composes: carry the EWMA forward
    as the next window's seed, which is exactly how the streaming twin
    would checkpoint it).
    """
    e = t(spark, sf_dir, "events")
    grouped = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "array_sort(collect_list(struct(ts, event_id, CAST(value AS DOUBLE) AS x)))"
        ).alias("rows"),
    )
    fold = (
        "aggregate(slice(rows, 2, size(rows) - 1), rows[0].x, "
        "(a, r) -> a * CAST(0.75 AS DOUBLE) + r.x * CAST(0.25 AS DOUBLE))"
    )
    return grouped.select("user_id", "n_events", F.expr(fold).alias("ewma"))


@query(
    "win_retention_cohort",
    family="windows",
    oracle="""
    WITH signup AS (
        SELECT user_id,
               CAST(min(date_trunc('month', ts)) AS TIMESTAMP) AS cohort
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, s.cohort,
               CAST((extract(YEAR FROM ts) * 12 + extract(MONTH FROM ts))
                    - (extract(YEAR FROM cohort) * 12
                       + extract(MONTH FROM cohort)) AS BIGINT) AS month_off
        FROM events e JOIN signup s ON s.user_id = e.user_id
        WHERE e.ts >= s.cohort
    )
    SELECT a.cohort, a.month_off, count(*) AS n_active,
           count(*) * 1.0 / max(sz.cohort_size) AS retention
    FROM activity a
    JOIN (SELECT cohort, count(*) AS cohort_size
          FROM signup GROUP BY cohort) sz
      ON sz.cohort = a.cohort
    GROUP BY a.cohort, a.month_off
    """,
)
def win_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — THE product-analytics rollup: users
    cohorted by first-signup month, counted as retained in each
    month-offset where they show ANY activity; retention = active
    users / cohort size. Month arithmetic is integer (year*12+month),
    so offsets are exact in both engines; retention divides two exact
    counts.

    Plan: the signup cohort is a per-user min aggregate (one shuffle
    on user_id); activity joins it back on the SAME key (exchange
    reuse), dedups per (user, cohort, offset) map-side, and the final
    matrix is a small-key aggregate joined to broadcast cohort sizes.
    At 100 TB the matrix is (months × offsets) rows — the data never
    moves twice.
    """
    e = t(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("month", F.min("ts")).alias("cohort"))
    )
    months = F.year("ts") * 12 + F.month("ts")
    cohort_months = F.year("cohort") * 12 + F.month("cohort")
    activity = (
        e.join(signup, "user_id")
        .filter(F.col("ts") >= F.col("cohort"))
        .select(
            "user_id",
            "cohort",
            (months - cohort_months).cast("bigint").alias("month_off"),
        )
        .distinct()
    )
    sizes = signup.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        activity.groupBy("cohort", "month_off")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "month_off",
            "n_active",
            (F.col("n_active") * F.lit(1.0) / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


@query(
    "win_streaks",
    family="windows",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - to_days(CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INT)) AS anchor
        FROM days
    ),
    streaks AS (
        SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
               count(*) AS streak_days
        FROM isl GROUP BY user_id, anchor
    ),
    best AS (
        SELECT user_id, streak_start, streak_end, streak_days,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY streak_days DESC,
                                           streak_start) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_streaks
        FROM streaks
    )
    SELECT user_id, streak_start, streak_end,
           CAST(streak_days AS BIGINT) AS streak_days,
           CAST(n_streaks AS BIGINT) AS n_streaks
    FROM best WHERE rn = 1
    """,
)
def win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands date trick: subtract row_number (in day order)
    from each distinct active day; consecutive days collapse to ONE
    anchor value, so a plain groupBy on (user, anchor) materializes
    every streak without self-joins or iterative logic. Deterministic
    pick of the best streak: (length DESC, start) total order.

    Plan: distinct days, the day-ordered window, the streak groupBy
    and the best-pick window all key on user_id — one exchange serves
    all four (ENSURE_REQUIREMENTS inserts nothing); the islands trick
    turns what looks like sequence analysis into two partition-local
    sorted passes. Integer date arithmetic ⇒ exact in both engines.
    """
    e = t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor",
        F.col("d") - F.make_interval(days=F.row_number().over(w)),
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), "streak_start"
    )
    return (
        streaks.select(
            "user_id",
            "streak_start",
            "streak_end",
            "streak_days",
            F.row_number().over(wb).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("user_id"))
            .alias("n_streaks"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "streak_start", "streak_end", "streak_days", "n_streaks"
        )
    )


@query(
    "win_attribution",
    family="windows",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts,
           min(c.ts) AS first_touch_ts,
           max(c.ts) AS last_touch_ts,
           count(*) AS n_touches,
           round(1.0 / count(*), 6) AS linear_credit
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-model marketing attribution in one pass: per converted
    purchase, the FIRST-touch and LAST-touch click in the 1-hour
    lookback plus the LINEAR model's per-touch credit (1/n) — the
    three standard attribution models from one aggregate, instead of
    one as-of join per model. min/max/count are order-insensitive, so
    the result is deterministic at any parallelism.

    Scale: the interval join banded on user_id (the equi component)
    shuffles each side once; the per-purchase aggregate reuses the
    purchase-side partitioning. The streaming twin is
    core.click_attribution (same join, watermark-bounded state) with
    this aggregate applied per micro-batch output.
    """
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts > p.purchase_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts <= p.purchase_ts),
    )
    return joined.groupBy("purchase_id", "user_id", "purchase_ts").agg(
        F.min("c_ts").alias("first_touch_ts"),
        F.max("c_ts").alias("last_touch_ts"),
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.lit(1.0) / F.count(F.lit(1)), 6).alias("linear_credit"),
    )


@query(
    "win_drawdown",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,6))
                             ELSE CAST(-value AS DECIMAL(18,6)) END)
                    AS DECIMAL(18,6)) AS net
        FROM events
        WHERE event_type IN ('purchase', 'error')
        GROUP BY 1
    ),
    series AS (
        SELECT day, net,
               CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS DECIMAL(28,6)) AS cum
        FROM daily
    ),
    peaks AS (
        SELECT day, net, cum,
               max(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS peak
        FROM series
    )
    SELECT day,
           CAST(net AS DOUBLE) AS net,
           CAST(cum AS DOUBLE) AS cum,
           CAST(peak AS DOUBLE) AS peak,
           CAST(peak - cum AS DOUBLE) AS drawdown,
           CAST(max(peak - cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) AS max_drawdown_so_far
    FROM peaks
    """,
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and maximum drawdown of the daily net-value series
    (purchases credit, errors debit) — the risk-curve window battery
    every monitoring dashboard runs on a cumulative KPI.

    The raw stream collapses to one row per day BEFORE any ordered
    window, so the global sort touches day-count rows, not events (at
    100 TB: still one row per day). Every windowed sum/max runs over
    exact DECIMAL — frame order cannot perturb a bit — and converts to
    DOUBLE only at the output edge; drawdown subtraction happens in
    decimal, so peak − cum is exact.
    """
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    signed = F.when(
        F.col("event_type") == "purchase", dec("value")
    ).otherwise(dec(-F.col("value")))
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(signed).cast("decimal(18,6)").alias("net")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    series = daily.select(
        "day", "net", F.sum("net").over(w).cast("decimal(28,6)").alias("cum")
    )
    peaks = series.select(
        "day", "net", "cum", F.max("cum").over(w).alias("peak")
    )
    dd = F.col("peak") - F.col("cum")
    return peaks.select(
        "day",
        F.col("net").cast("double").alias("net"),
        F.col("cum").cast("double").alias("cum"),
        F.col("peak").cast("double").alias("peak"),
        dd.cast("double").alias("drawdown"),
        F.max(dd).over(w).cast("double").alias("max_drawdown_so_far"),
    )


@query(
    "win_zscore",
    family="windows",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               count(*) * 1.0 AS n,
               CAST(sum(c) AS DOUBLE) AS sx,
               CAST(sum(c * c) AS DOUBLE) AS sxx
        FROM d GROUP BY event_type
    )
    SELECT d.event_type, d.day, CAST(d.c AS BIGINT) AS n_events,
           round((d.c - sx / n)
                 / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS zscore,
           CASE WHEN abs((d.c - sx / n)
                         / sqrt((sxx - sx * sx / n) / (n - 1))) > 2.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM d JOIN m ON d.event_type = m.event_type
    """,
)
def win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume z-score anomaly flags per event type — the
    volume-anomaly detector of a streaming-adjacent monitoring stack
    (|z| > 2 flags a day whose event count sits outside ~95% of that
    type's distribution).

    The moments are exact BIGINT sums over integer day counts,
    aggregated per type and JOINED back (broadcast — type-count-sized)
    rather than windowed: a count-over-window would sort every
    partition (SCALE.md §11), while groupBy + broadcast join reuses
    the day-aggregate's exchange and stays sort-free. The z expression
    is fixed-operand-order double math rounded to 6 dp; the flag
    re-derives the same expression so both engines branch on the
    identical double.
    """
    e = t(spark, sf_dir, "events")
    # persisted: the day aggregate feeds both the moments and the join
    # probe — without it the raw stream is scanned twice
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    ).persist()
    m = d.groupBy("event_type").agg(
        (F.count(F.lit(1)) * F.lit(1.0)).alias("n"),
        F.sum("c").cast("double").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("sxx"),
    )
    j = d.join(F.broadcast(m), "event_type")
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    z = (F.col("c") - sx / n) / F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0)))
    return j.select(
        "event_type",
        "day",
        F.col("c").cast("bigint").alias("n_events"),
        F.round(z, 6).alias("zscore"),
        F.when(F.abs(z) > 2.0, 1).otherwise(0).alias("is_anomaly"),
    )


@query(
    "win_interpolate",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               count(*) AS n,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
                    AS DECIMAL(28,6)) AS DOUBLE) / count(*) AS val
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                      (SELECT max(day) FROM daily),
                                      INTERVAL 1 DAY))::DATE AS day
    ),
    obs AS (
        -- deterministic sensor outage: every 3rd day-of-month is lost
        SELECT s.day,
               CASE WHEN day(s.day) % 3 = 0 THEN NULL ELSE d.val END AS val
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    ),
    ctx AS (
        SELECT day, val,
               last_value(val IGNORE NULLS) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS prev_val,
               last_value(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prev_day,
               first_value(val IGNORE NULLS) OVER (
                   ORDER BY day ROWS BETWEEN 1 FOLLOWING
                   AND UNBOUNDED FOLLOWING) AS next_val,
               first_value(CASE WHEN val IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (ORDER BY day ROWS BETWEEN 1 FOLLOWING
                         AND UNBOUNDED FOLLOWING) AS next_day
        FROM obs
    )
    SELECT day,
           CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END AS observed,
           round(CASE
               WHEN val IS NOT NULL THEN val
               WHEN prev_val IS NULL THEN next_val
               WHEN next_val IS NULL THEN prev_val
               ELSE prev_val + (next_val - prev_val)
                    * (date_diff('day', prev_day, day) * 1.0
                       / date_diff('day', prev_day, next_day))
           END, 6) AS val_filled
    FROM ctx
    """,
)
def win_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with linear interpolation: the daily
    purchase-value series loses every 3rd day-of-month (a deterministic
    'sensor outage'), and missing days are reconstructed from their
    nearest observed neighbors — the resample/interpolate step every
    feature pipeline runs before a model sees a regular series.

    Shape: calendar spine (sequence over the observed range) LEFT JOIN
    the day aggregate, then four IGNORE NULLS window lookups (previous/
    next observed value and day) and one closed-form lerp — boundary
    gaps degrade to forward/backward fill. Determinism: the day
    aggregate divides an exact decimal sum by an integer count, the
    lerp is fixed-operand-order double math rounded to 6 dp, and
    day-distance ratios are exact integers. Scale: everything after
    the first aggregate operates on day-count rows; the ordered window
    is calendar-sized, never event-sized.
    """
    from local_etl_spark.queries._util import dsum

    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # persisted: the spine bounds and the spine join both consume the
    # day aggregate — one events scan total
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        (dsum(dec("value")) / F.count(F.lit(1))).alias("val")
    ).persist()
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    obs = spine.join(daily, "day", "left").select(
        "day",
        F.when(F.dayofmonth("day") % 3 == 0, F.lit(None)).otherwise(
            F.col("val")
        ).alias("val"),
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.orderBy("day").rowsBetween(1, Window.unboundedFollowing)
    day_if_obs = F.when(F.col("val").isNotNull(), F.col("day"))
    ctx = obs.select(
        "day",
        "val",
        F.last("val", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.last(day_if_obs, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first("val", ignorenulls=True).over(w_next).alias("next_val"),
        F.first(day_if_obs, ignorenulls=True).over(w_next).alias("next_day"),
    )
    lerp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        F.datediff("day", "prev_day")
        * F.lit(1.0)
        / F.datediff("next_day", "prev_day")
    )
    filled = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(lerp)
    )
    return ctx.select(
        "day",
        F.when(F.col("val").isNotNull(), 1).otherwise(0).alias("observed"),
        F.round(filled, 6).alias("val_filled"),
    )


SESSION_GAP_MIN = 30  # inactivity gap that closes a session

# Shared by win_sessionize and win_sessionize_split: the split variant
# is semantics-identical by construction, so it carries the SAME oracle
# text (VERDICT r8 #6) — the DuckDB ground truth for both is the plain
# per-user gaps-and-islands.
_SESSIONIZE_ORACLE = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts)
                         <= {SESSION_GAP_MIN} * 60000000
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id,
               sum(new_sess) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)
               AS duration_us
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """


@query("win_sessionize", family="windows", oracle=_SESSIONIZE_ORACLE)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a user's events split into sessions at
    every >30-minute inactivity gap (the canonical web-analytics
    operator; stream_session is this query's streaming twin with state
    timeouts instead of lag).

    The gaps-and-islands recipe in two partition-local passes: lag
    over (user, ts) flags session starts, a running sum of the flags
    numbers the sessions, then one groupBy collapses each island to
    (start, end, count, duration). Every window and the aggregate key
    on user_id, so ONE user exchange serves all three — no global
    window anywhere, and the session count per user is bounded by the
    user's own event count regardless of corpus size. Boundary flags
    compare timestamps only (ties get flag 0 under any tiebreak), so
    the event_id tiebreak is for deterministic traversal, not output.
    """
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff handles TIMESTAMP_NTZ (a plain long cast does not);
    # microsecond precision — a SECOND-truncated gap compare puts a
    # 1800.5 s gap in the same session while the oracle's interval
    # compare splits it (timestamps are exact µs, so µs diffs are exact)
    gap_ok = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") <= (
        SESSION_GAP_MIN * 60_000_000
    )
    flagged = e.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ok, 0).otherwise(1).alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_sess").over(w).alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias(
                "duration_us"
            ),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "session_start",
            "session_end",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("duration_us").cast("bigint").alias("duration_us"),
        )
    )


@query("win_sessionize_split", family="windows", oracle=_SESSIONIZE_ORACLE)
def win_sessionize_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_sessionize's 100 TB skew mitigation, implemented (SCALE.md
    §16.3 documented it; VERDICT r8 #6 asked for the code): a session
    window is per-user BY SEMANTICS, so a 20%-hot user turns the plain
    per-user window into one straggler task holding that user's entire
    lifetime. Two-phase boundary-split form:

    1. Gaps-and-islands within (user_id, calendar day) splits — the
       hot task is now bounded by ONE DAY of one user's events, not
       their lifetime. The first event of each split flags a session
       start unconditionally (lag is NULL at the split edge), which
       over-splits exactly at day boundaries.
    2. Stitch on SESSION SUMMARIES: per user, a summary merges into
       its predecessor iff its first event is within the gap of the
       predecessor's last event. Within a split, consecutive islands
       are > gap apart by construction, so the merge flag re-derives
       them unchanged; only boundary-crossing sessions fuse, and
       midnight-spanning chains fuse transitively because the stitch
       is itself gaps-and-islands over start/end times. The stitch
       window is per-user but sees session summaries (bounded by the
       user's session count), not raw events — the win_streaks
       two-phase shape.

    The merged running sum of stitch flags IS the original session_id
    (both count true session starts in time order), so the operator is
    row-identical to win_sessionize and carries the same oracle text;
    tests/test_plan_shape.py pins that the phase-1 window partitions by
    (user_id, day) and the equality test pins the row set.
    """
    e = t(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60_000_000
    gap_ok = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") <= gap_us
    flagged = (
        e.select("user_id", "ts", "event_id", F.to_date("ts").alias("day"))
        .select(
            "user_id",
            "day",
            "ts",
            "event_id",
            F.lag("ts").over(w1).alias("prev_ts"),
        )
        .select(
            "user_id",
            "day",
            "ts",
            "event_id",
            F.when(gap_ok, 0).otherwise(1).alias("new_sess"),
        )
    )
    local = flagged.select(
        "user_id",
        "day",
        "ts",
        F.sum("new_sess").over(w1).alias("local_sess"),
    )
    # per-split session summaries: the only rows phase 2 ever shuffles
    splits = local.groupBy("user_id", "day", "local_sess").agg(
        F.min("ts").alias("s_start"),
        F.max("ts").alias("s_end"),
        F.count(F.lit(1)).alias("n"),
    )
    w2 = Window.partitionBy("user_id").orderBy("s_start")
    stitch_ok = F.expr(
        "timestampdiff(MICROSECOND, prev_end, s_start)"
    ) <= gap_us
    stitched = splits.select(
        "user_id",
        "s_start",
        "s_end",
        "n",
        F.lag("s_end").over(w2).alias("prev_end"),
    ).select(
        "user_id",
        "s_start",
        "s_end",
        "n",
        F.when(stitch_ok, 0).otherwise(1).alias("starts"),
    )
    merged = stitched.select(
        "user_id",
        "s_start",
        "s_end",
        "n",
        F.sum("starts").over(w2).alias("session_id"),
    )
    return (
        merged.groupBy("user_id", "session_id")
        .agg(
            F.min("s_start").alias("session_start"),
            F.max("s_end").alias("session_end"),
            F.sum("n").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "session_start",
            "session_end",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr(
                "timestampdiff(MICROSECOND, session_start, session_end)"
            )
            .cast("bigint")
            .alias("duration_us"),
        )
    )


@query(
    "win_period_over_period",
    family="windows",
    oracle="""
    WITH m AS (
        SELECT c_nationkey AS nationkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DECIMAL(28,6)) AS DOUBLE) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    )
    SELECT nationkey, month, rev,
           lag(rev) OVER w AS prev_rev,
           round((rev - lag(rev) OVER w) / lag(rev) OVER w, 6) AS mom_pct
    FROM m
    WINDOW w AS (PARTITION BY nationkey ORDER BY month)
    ORDER BY nationkey, month
    """,
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the
    period-over-period comparison every reporting layer ships: one
    month-grain aggregate, then lag over (nation, month) for the
    previous period and the relative delta (first month NULL by
    definition, no fallback fabrication).

    Scale: the aggregate collapses orders to a nation×month grid
    BEFORE any window (the window input is bounded by that grid, not
    the fact table), and the lag partitions by nation — the groupBy
    and the window share the nationkey exchange. Determinism: revenue
    is the engine-wide exact-DECIMAL sum cast to double; the growth
    rate is one fixed-operand-order division rounded at the edge.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(dsum(dec("o_totalprice")).alias("rev"))
    )
    w = Window.partitionBy("nationkey").orderBy("month")
    prev = F.lag("rev").over(w)
    return m.select(
        "nationkey",
        "month",
        "rev",
        prev.alias("prev_rev"),
        F.round((F.col("rev") - prev) / prev, 6).alias("mom_pct"),
    )


@query(
    "win_gap_fill",
    family="windows",
    oracle="""
    WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1
    ),
    spine AS (
        SELECT user_id, CAST(unnest(generate_series(lo, hi,
               INTERVAL 1 DAY)) AS DATE) AS day
        FROM span
    )
    SELECT spine.user_id, spine.day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           CAST(d.n IS NULL AS INT) AS filled
    FROM spine LEFT JOIN d
      ON d.user_id = spine.user_id AND d.day = spine.day
    ORDER BY spine.user_id, spine.day
    """,
)
def win_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily gap fill: densify each user's activity series so
    EMPTY days appear with an explicit zero (the per-key twin of
    sql_recursive's global calendar spine — rates, SLAs and rolling
    averages are all wrong on a series with silent holes).

    The spine comes from ``sequence(min_day, max_day)`` exploded per
    user — generation is bounded by each user's own span (never a
    global calendar × users cross join), stays on the user's partition,
    and the spine←counts join shares the groupBys' user_id exchange.
    Everything is integer/date arithmetic — nothing to round.
    """
    e = t(spark, sf_dir, "events")
    d = (
        e.select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        d.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    return (
        spine.join(d, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.col("n").isNull().cast("int").alias("filled"),
        )
    )


_RCORR_WINDOW = (
    "PARTITION BY nationkey ORDER BY day "
    "RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW"
)

_RCORR_BODY = """
SELECT nationkey, CAST(day AS DATE) AS day,
       CAST(count(*) OVER w AS BIGINT) AS n_days,
       CASE WHEN count(*) OVER w * sum(x * x) OVER w
                 - sum(x) OVER w * sum(x) OVER w = 0
              OR count(*) OVER w * sum(y * y) OVER w
                 - sum(y) OVER w * sum(y) OVER w = 0
            THEN NULL
            ELSE round(
              CAST(count(*) OVER w * sum(x * y) OVER w
                   - sum(x) OVER w * sum(y) OVER w AS DOUBLE)
              / sqrt(CAST(count(*) OVER w * sum(x * x) OVER w
                          - sum(x) OVER w * sum(x) OVER w AS DOUBLE)
                     * CAST(count(*) OVER w * sum(y * y) OVER w
                            - sum(y) OVER w * sum(y) OVER w AS DOUBLE)), 6)
       END AS rcorr
FROM {src}
WINDOW w AS ({win})
"""


@query(
    "win_rolling_corr",
    family="windows",
    oracle=f"""
    WITH d AS (
        SELECT c_nationkey AS nationkey,
               CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               CAST(floor(sum(CAST(o_totalprice AS DECIMAL(18,6))) / 1000)
                    AS BIGINT) AS x,
               CAST(count(*) AS BIGINT) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    )
    {_RCORR_BODY.format(src="d", win=_RCORR_WINDOW)}
    ORDER BY nationkey, day
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between daily revenue and daily
    order count per nation over a trailing 90-day event-time frame —
    the windowed version of agg_corr_matrix's moment algebra, and the
    monitoring primitive behind 'did these two series decouple
    recently?'.

    Determinism across engines is the hard part: both engines compute
    sliding-frame aggregates with different internal accumulation
    (DuckDB segment trees vs Spark's running frames), so DOUBLE frame
    sums would drift in the low bits. Every windowed sum here is over
    exact INTEGERS (revenue floor-scaled to k$, counts as-is — the
    agg_regr scaling trick, keeping n·Σx² within int64), and the
    correlation derives from those exact moments in one fixed-operand
    double expression, rounded at the edge. Zero-variance frames are
    NULL by explicit integer guard, not by engine-specific division
    semantics. Scale: the window input is the nation×day grid (never
    the fact table) and the day aggregate + window share the
    nationkey exchange."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    d = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(
            F.floor(F.sum(dec("o_totalprice")) / 1000)
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    d.createOrReplaceTempView("_win_rcorr_days")
    return spark.sql(
        _RCORR_BODY.format(src="_win_rcorr_days", win=_RCORR_WINDOW)
    )


_CUSUM_BODY = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS x
    FROM {src} GROUP BY event_type, CAST(ts AS DATE)
),
tot AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS DECIMAL(28,6)) AS total
    FROM daily GROUP BY event_type
),
dev AS (
    SELECT d.event_type, d.day, t.n,
           CAST(CAST(t.n AS DECIMAL(10,0)) * d.x - t.total
                AS DECIMAL(38,6)) AS dd
    FROM daily d JOIN tot t ON d.event_type = t.event_type
),
pre1 AS (
    SELECT event_type, day, n,
           sum(dd) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS s
    FROM dev
),
pre AS (
    SELECT event_type, day, n, s,
           least(CAST(0 AS DECIMAL(38,6)),
                 min(s) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)) AS runmin
    FROM pre1
),
cu AS (
    SELECT event_type, day, n, s - runmin AS cusum,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY s - runmin DESC, day) AS rk,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY day DESC) AS last_rk
    FROM cu_base
)
SELECT event_type, n AS n_days,
       round(CAST(max(CASE WHEN rk = 1 THEN cusum END) AS DOUBLE)
             / max(n), 6) AS peak_cusum,
       max(CASE WHEN rk = 1 THEN day END) AS peak_day,
       round(CAST(max(CASE WHEN last_rk = 1 THEN cusum END) AS DOUBLE)
             / max(n), 6) AS final_cusum
FROM cu
GROUP BY event_type, n
ORDER BY event_type
"""


@query(
    "win_cusum",
    family="windows",
    oracle=_CUSUM_BODY.replace("{src}", "events").replace(
        "FROM cu_base", "FROM pre"
    ),
)
def win_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint statistic per event type over the
    daily-value series: C_t = S_t − min_{j≤t} S_j where S is the
    prefix sum of deviations from the series mean — the control-chart
    operator behind 'when did this metric shift upward?'. Reports the
    peak statistic, the day it peaked (the changepoint estimate,
    first-day tie-break), and the final value.

    The recursive textbook form C_t = max(0, C_{t−1} + d_t) is
    window-INexpressible, but it algebraically equals prefix-sum
    minus running-min — two frame aggregates (win_drawdown's trick
    pointed the other way). Determinism: deviations are scaled by n
    (d_t = n·x_t − total) so NO division happens before the windows —
    every prefix/min/compare runs in EXACT DECIMAL (frame-accumulator
    order cannot matter), and the single normalizing division to
    double happens at the edge. Scale: windows partition by
    event_type over the type×day grid, never the event stream.
    """
    t(spark, sf_dir, "events").createOrReplaceTempView("_win_cusum_events")
    return spark.sql(
        _CUSUM_BODY.replace("{src}", "_win_cusum_events").replace(
            "FROM cu_base", "FROM pre"
        )
    )


# The dynamic-gap session ORACLE, shared verbatim by win_session_dynamic
# and stream_session_dynamic (ADVICE r5: two drifting copies before).
# Emulates interval-union islanding: an event opens a new session
# exactly when its start reaches the running max EXPIRY of all prior
# events (half-open [ts, ts+gap) windows — boundary-touching events
# split, matching session_window's strict semantics); µs-exact interval
# arithmetic both sides. Gap constants live with the engine function
# (streaming.core) so the oracle can never drift from the computation.
SESSION_DYNAMIC_ORACLE = f"""
    WITH e AS (
        SELECT user_id, event_id, ts,
               ts + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL {stream_core.SESSION_GAP_PURCHASE} MINUTE
                         ELSE INTERVAL {stream_core.SESSION_GAP_OTHER} MINUTE
                    END AS expiry
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, ts, expiry,
               CASE WHEN ts >= max(expiry) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR max(expiry) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
    ),
    sess AS (
        SELECT user_id, event_id, ts, expiry,
               sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(expiry) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """


@query(
    "win_session_dynamic",
    family="windows",
    oracle=SESSION_DYNAMIC_ORACLE,
)
def win_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization via Spark's NATIVE session_window
    with a PER-EVENT gap expression — purchases hold a session open
    longer than other events (the engagement-weighted timeout
    pattern). Complements win_sessionize: that operator builds
    fixed-gap sessions from window primitives; this one exercises the
    built-in session aggregation and its dynamic-gap form, which the
    manual lag/cumsum construction cannot express as one flag.

    ONE implementation for batch and streaming (ADVICE r5): this is
    core.session_aggregate_dynamic — the same call
    stream_session_dynamic replays as a real file-source stream — and
    both queries share SESSION_DYNAMIC_ORACLE. Scale: one user-keyed
    exchange with partial session merging map-side.
    """
    return stream_core.session_aggregate_dynamic(t(spark, sf_dir, "events"))


@query(
    "win_seasonal_decompose",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    tr AS (
        SELECT day, c,
               CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
                   AS dow,
               CAST(sum(c) OVER w AS BIGINT) AS t_c,
               CAST(count(*) OVER w AS BIGINT) AS n_t
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    ),
    det AS (
        SELECT day, c, dow,
               CASE WHEN n_t = 3 THEN 3 * c - t_c END AS d3,
               CASE WHEN n_t = 3 THEN t_c END AS t_c
        FROM tr
    ),
    seas AS (
        SELECT dow, CAST(sum(d3) AS BIGINT) AS s_num,
               CAST(count(d3) AS BIGINT) AS s_den
        FROM det GROUP BY dow
    )
    SELECT det.day,
           round(det.c / 100.0, 6) AS revenue,
           round(det.t_c / 300.0, 6) AS trend,
           round(CAST(s_num AS DOUBLE) / s_den / 300.0, 6) AS seasonal,
           round(det.d3 / 300.0
                 - CAST(s_num AS DOUBLE) / s_den / 300.0, 6) AS residual
    FROM det JOIN seas ON det.dow = seas.dow
    """,
)
def win_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    centered 3-day moving-average trend, day-of-week seasonal means of
    the detrended series, residual = value − trend − seasonal — the
    series a drift monitor alarms on (residual spikes) instead of the
    raw values (which alias weekly rhythm as anomalies). Edge days
    without a full trend window surface NULL trend/residual rather
    than a biased partial mean.

    Determinism across engines is ALL-INTEGER until the final
    divisions: daily revenue in exact cents, the trend frame as an
    exact BIGINT frame SUM (sliding-frame DOUBLE accumulators differ
    between engines — the win_rolling_corr lesson), the detrended
    series as 3·c − Σframe (exact, no division), seasonal means as
    one int/int division, and day-of-week as epoch-days mod 7 (Spark
    and DuckDB disagree on dayofweek() numbering). Scale: one
    day-grain aggregate; the unpartitioned windows run over the
    CALENDAR-BOUNDED day grid (ALLOW_GLOBAL_WINDOW class), and the
    7-row seasonal table broadcasts back.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("c")
    )
    w = Window.orderBy("day").rowsBetween(-1, 1)
    tr = daily.select(
        "day",
        "c",
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7)
        .cast("bigint")
        .alias("dow"),
        F.sum("c").over(w).cast("bigint").alias("t_c"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_t"),
    )
    det = tr.select(
        "day",
        "c",
        "dow",
        F.when(F.col("n_t") == 3, 3 * F.col("c") - F.col("t_c")).alias("d3"),
        F.when(F.col("n_t") == 3, F.col("t_c")).alias("t_c"),
    )
    seas = det.groupBy("dow").agg(
        F.sum("d3").cast("bigint").alias("s_num"),
        F.count("d3").cast("bigint").alias("s_den"),
    )
    s_mean = F.col("s_num").cast("double") / F.col("s_den") / F.lit(300.0)
    return det.join(F.broadcast(seas), "dow").select(
        "day",
        F.round(F.col("c") / 100.0, 6).alias("revenue"),
        F.round(F.col("t_c") / 300.0, 6).alias("trend"),
        F.round(s_mean, 6).alias("seasonal"),
        F.round(F.col("d3") / 300.0 - s_mean, 6).alias("residual"),
    )


@query(
    "win_mann_kendall",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
                   AS s
        FROM daily a JOIN daily b ON b.day > a.day
    ),
    ties AS (
        SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
               CAST(sum(t) AS BIGINT) AS n
        FROM (SELECT count(*) AS t FROM daily GROUP BY c)
    )
    SELECT n, s,
           round((CASE WHEN s > 0 THEN s - 1.0
                       WHEN s < 0 THEN s + 1.0 ELSE 0.0 END)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_term) / 18), 6) AS z
    FROM pairs CROSS JOIN ties
    """,
)
def win_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on daily revenue — the nonparametric
    'is this series drifting' detector next to win_cusum's changepoint
    and win_seasonal_decompose's rhythm split: S = Σ over ordered day
    pairs of sign(later − earlier), z with the standard tie-corrected
    variance and continuity correction.

    Determinism: daily values are exact integer cents; S and the tie
    term are exact BIGINT aggregates (sign() over integer compares);
    the z chain is one fixed double expression. Scale: the day-pair
    self-join is over the CALENDAR-BOUNDED day grid (30 days → 435
    pairs; even a decade is ~6.7M pairs — grid-sized, never
    data-sized), the one place a quadratic join is genuinely safe;
    the corpus-sized work is the single day-grain aggregate.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("c")
    ).persist()
    a = daily.select(F.col("day").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("c").alias("cb"))
    pairs = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_term"),
            F.sum("t").cast("bigint").alias("n"),
        )
    )
    return pairs.crossJoin(ties).select(
        "n",
        "s",
        F.expr(
            "round((CASE WHEN s > 0 THEN s - 1.0"
            "             WHEN s < 0 THEN s + 1.0 ELSE 0.0 END)"
            " / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
            "         - tie_term) / 18), 6)"
        ).alias("z"),
    )


@query(
    "win_skyline",
    family="windows",
    oracle="""
    WITH lv AS (
        SELECT o_totalprice AS p, max(o_orderdate) AS dmax
        FROM orders GROUP BY 1
    ),
    pr AS (
        SELECT p, dmax,
               max(dmax) OVER (ORDER BY p DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS hi
        FROM lv
    )
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN pr ON o.o_totalprice = pr.p
    WHERE (pr.hi IS NULL OR o.o_orderdate > pr.hi)
      AND o.o_orderdate = pr.dmax
    """,
)
def win_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of orders on (price, recency): keep
    every order no other order beats on BOTH dimensions — B dominates
    A iff B.price ≥ A.price, B.date ≥ A.date, and at least one is
    strict. The multi-criteria shortlist primitive (best
    price-vs-freshness trade-offs) that a naive formulation writes as
    an O(n²) NOT EXISTS self-join.

    Sort-based linear form: collapse to DISTINCT price levels with
    each level's max date, take the EXCLUSIVE running max date over
    strictly-higher prices (ordered_prefix in descending price order —
    range-partitioned, never a one-task window; the exclusive shift is
    a rank self-join on the level table), then one co-keyed join back:
    a row survives iff its date beats every higher price's best date
    AND is its own price level's best. Equal (price, date) twins
    don't dominate each other and all survive. Levels are
    price-cardinality-sized (grid, not data); the only corpus-sized
    ops are one groupBy and one join.
    tests/test_llm_pipeline.py::test_skyline_matches_dominance_scan
    checks the output against a brute-force dominance scan.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    lv = o.groupBy(F.col("o_totalprice").alias("p")).agg(
        F.max("o_orderdate").alias("dmax")
    )
    pref, _n = ordered_prefix(
        lv,
        [F.col("p").desc()],
        rank_col="rk",
        prefix=(("dmax", "max", "run_incl"),),
    )
    prev = pref.select(
        (F.col("rk") + 1).alias("rk"), F.col("run_incl").alias("hi")
    )
    levels = pref.select("p", "dmax", "rk").join(prev, "rk", "left")
    return (
        o.join(levels, o.o_totalprice == levels.p)
        .filter(
            (F.col("hi").isNull() | (F.col("o_orderdate") > F.col("hi")))
            & (F.col("o_orderdate") == F.col("dmax"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "win_theil_sen",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS d,
               c
        FROM daily
    ),
    sl AS (
        SELECT quantile_cont(
                   CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE),
                   0.5) AS slope,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM idx a JOIN idx b ON b.d > a.d
    ),
    ic AS (
        SELECT quantile_cont(
                   CAST(c AS DOUBLE) - slope * CAST(d AS DOUBLE), 0.5)
                   AS intercept
        FROM idx CROSS JOIN sl
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_days,
           n_pairs,
           round(slope, 6) + 0.0 AS slope,
           round(intercept, 6) + 0.0 AS intercept
    FROM sl CROSS JOIN ic
    """,
)
def win_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimator on daily revenue — the
    median-of-pairwise-slopes line fit (breakdown point 29%), the
    robust companion to win_mann_kendall's trend TEST: MK says whether
    the series drifts, Theil–Sen says how fast, immune to the outlier
    days that wreck an OLS fit. Intercept = median(c_i − slope·d_i)
    (the standard Theil–Sen intercept).

    Determinism: daily values are exact integer cents and day indices
    exact ints, so every pairwise slope is one identical IEEE division;
    the medians sort doubles and interpolate midpoints the same way in
    both engines (percentile ≡ quantile_cont, h = (n−1)·q); `+ 0.0`
    normalizes −0.0. Scale: like win_mann_kendall, the pair join is
    over the CALENDAR-BOUNDED day grid (grid-sized, never data-sized);
    the corpus-sized work is one day-grain aggregate.
    """
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("c")
        )
        .select(
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
            "c",
        )
        .persist()
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    sl = (
        a.join(b, F.col("db") > F.col("da"))
        .select(
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("db") - F.col("da")).cast("double")
            ).alias("m")
        )
        .agg(
            F.percentile(F.col("m"), F.lit(0.5)).alias("slope"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ic = (
        daily.crossJoin(sl)
        .select(
            (
                F.col("c").cast("double")
                - F.col("slope") * F.col("d").cast("double")
            ).alias("r"),
            "slope",
            "n_pairs",
        )
        .groupBy("slope", "n_pairs")
        .agg(F.percentile(F.col("r"), F.lit(0.5)).alias("intercept"))
    )
    return n_days.crossJoin(ic).select(
        "n_days",
        "n_pairs",
        (F.round("slope", 6) + 0.0).alias("slope"),
        (F.round("intercept", 6) + 0.0).alias("intercept"),
    )


@query(
    "win_pettitt",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    u AS (
        SELECT a.day AS day,
               CAST(sum(CASE WHEN i.c > j.c THEN 1
                             WHEN i.c < j.c THEN -1 ELSE 0 END) AS BIGINT)
                   AS u_t
        FROM daily a
        JOIN daily i ON i.day <= a.day
        JOIN daily j ON j.day > a.day
        GROUP BY a.day
    ),
    k AS (
        SELECT day AS cp_day, abs(u_t) AS k_stat
        FROM u
        ORDER BY abs(u_t) DESC, day
        LIMIT 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           k_stat, cp_day
    FROM k
    """,
)
def win_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test on daily revenue — the nonparametric
    single-changepoint locator that completes the drift toolkit:
    win_mann_kendall says WHETHER the series drifts, win_theil_sen how
    fast, win_cusum tracks level shifts online, Pettitt finds WHERE
    the split maximizes the rank disparity. U_t = Σ_{i≤t, j>t}
    sign(x_i − x_j); the statistic is K = max|U_t| and the changepoint
    the day attaining it (earliest on ties).

    Determinism: daily values are exact cents, U_t is an exact BIGINT
    double sum over sign compares, and the arg-max orders on (|U_t|
    DESC, day) — no floats anywhere (the usual 2·exp(−6K²/(T³+T²))
    p-value is deliberately NOT emitted: exp() is libm-dependent, the
    one divergence class the determinism policy bans; K and T carry
    the same information exactly). Scale: the triple day join is over
    the CALENDAR-BOUNDED grid (T² pairs aggregated per split point —
    30 days → 13.5k terms; even a decade is grid-sized); the
    corpus-sized work is one day-grain aggregate.
    """
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("c")
        )
        .persist()
    )
    split = daily.select(F.col("day").alias("day"))
    i = daily.select(F.col("day").alias("di"), F.col("c").alias("ci"))
    j = daily.select(F.col("day").alias("dj"), F.col("c").alias("cj"))
    u = (
        split.join(i, F.col("di") <= F.col("day"))
        .join(j, F.col("dj") > F.col("day"))
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("ci") > F.col("cj"), 1)
                .when(F.col("ci") < F.col("cj"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("u_t")
        )
    )
    k = (
        u.select(F.col("day").alias("cp_day"), F.abs("u_t").alias("k_stat"))
        .orderBy(F.desc("k_stat"), "cp_day")
        .limit(1)
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return n_days.crossJoin(k).select("n_days", "k_stat", "cp_day")


KM_CENSOR_DAYS = 3  # users active in the final window are censored


@query(
    "win_kaplan_meier",
    family="windows",
    oracle=f"""
    WITH bounds AS (
        SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS maxd FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(date_diff('day',
                    min(CAST(date_trunc('day', ts) AS DATE)),
                    max(CAST(date_trunc('day', ts) AS DATE))) AS BIGINT)
                   AS lt,
               CASE WHEN max(CAST(date_trunc('day', ts) AS DATE))
                         <= (SELECT maxd FROM bounds) - {KM_CENSOR_DAYS}
                    THEN 1 ELSE 0 END AS died
        FROM events GROUP BY user_id
    ),
    km AS (
        SELECT k.lt AS t, CAST(sum(k.died) AS BIGINT) AS d,
               (SELECT CAST(count(*) AS BIGINT) FROM u u2
                WHERE u2.lt >= k.lt) AS n_risk
        FROM u k GROUP BY k.lt HAVING sum(k.died) > 0
    )
    SELECT a.t, max(a.n_risk) AS n_risk, max(a.d) AS d,
           round(CAST(list_reduce(
               list(CAST(1 - CAST(b.d AS DOUBLE) / b.n_risk AS DOUBLE)
                    ORDER BY b.t),
               (x, y) -> x * y) AS DOUBLE), 6) AS survival
    FROM km a JOIN km b ON b.t <= a.t
    GROUP BY a.t
    """,
)
def win_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of user LIFETIME (days between a
    user's first and last event), with right-censoring: users still
    active in the corpus' final KM_CENSOR_DAYS are censored, not
    churned — the product-limit estimator retention analysis runs on
    exactly this shape (win_retention_cohort counts who returns;
    Kaplan–Meier says how long users LAST while honestly handling the
    ones still alive). S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over death times.

    Determinism: lifetimes and at-risk/death counts are exact ints;
    each hazard factor is one IEEE division; the survival product
    folds in explicit death-time order on BOTH engines (Spark
    init-1.0 left fold ≡ DuckDB list_reduce — multiplying by exact
    1.0 is identity). Scale: one user-keyed aggregate over the corpus,
    then everything is death-time-grid-sized (≤ corpus days); the
    running product joins the grid to itself — the calendar-bounded
    quadratic class of win_mann_kendall.
    """
    e = t(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    u = (
        e.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"), F.max("day").alias("last_day"))
        .crossJoin(
            F.broadcast(
                e.select(day.alias("d")).agg(F.max("d").alias("maxd"))
            )
        )
        .select(
            F.datediff("last_day", "first_day").cast("bigint").alias("lt"),
            F.when(
                F.col("last_day") <= F.date_sub("maxd", KM_CENSOR_DAYS), 1
            )
            .otherwise(0)
            .alias("died"),
        )
        .persist()
    )
    deaths = (
        u.groupBy(F.col("lt").alias("t"))
        .agg(F.sum("died").cast("bigint").alias("d"))
        .filter(F.col("d") > 0)
    )
    risk = u.select(F.col("lt").alias("rlt"))
    km = (
        deaths.join(risk, F.col("rlt") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_risk"))
        .persist()
    )
    a = km.select(F.col("t"), F.col("n_risk"), F.col("d"))
    b = km.select(
        F.col("t").alias("bt"),
        (
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
        ).alias("f"),
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(bt, f))),"
        " s -> s.f), CAST(1 AS DOUBLE), (x, v) -> x * v)"
    )
    return (
        a.join(b, F.col("bt") <= F.col("t"))
        .groupBy("t")
        .agg(
            F.max("n_risk").alias("n_risk"),
            F.max("d").alias("d"),
            F.round(F.expr(fold), 6).alias("survival"),
        )
    )


HW_ALPHA = 0.25  # level smoothing — power of two, exact in binary
HW_BETA = 0.25  # trend smoothing — same


@query(
    "win_holt_winters",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               list_reduce(
                   list_transform(list(y ORDER BY d),
                                  v -> [v, CAST(0 AS DOUBLE)]),
                   (a, p) -> [
                       CAST({HW_ALPHA} AS DOUBLE) * p[1]
                         + CAST({1 - HW_ALPHA} AS DOUBLE) * (a[1] + a[2]),
                       CAST({HW_BETA} AS DOUBLE)
                         * ((CAST({HW_ALPHA} AS DOUBLE) * p[1]
                             + CAST({1 - HW_ALPHA} AS DOUBLE)
                               * (a[1] + a[2])) - a[1])
                         + CAST({1 - HW_BETA} AS DOUBLE) * a[2]
                   ]) AS lb
        FROM day GROUP BY event_type
    )
    SELECT event_type, n_days,
           round(lb[1], 6) + 0.0 AS level,
           round(lb[2], 6) + 0.0 AS trend,
           round(lb[1] + lb[2], 6) + 0.0 AS forecast_1,
           round(lb[1] + 7 * lb[2], 6) + 0.0 AS forecast_7
    FROM series
    """,
)
def win_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per event_type
    daily-revenue series — the trend-aware step up from win_ewma
    (level only) and the parametric sibling of win_seasonal_decompose:
    l_t = α·y_t + (1-α)(l_{t-1}+b_{t-1}), b_t = β(l_t-l_{t-1}) +
    (1-β)b_{t-1}, seeded l₀=y₀, b₀=0; h-step forecast = l+h·b.

    Determinism (the win_ewma class, extended to a PAIR state): both
    engines run the identical multiply-add chain left-to-right over
    the day-ordered series. The two-component recursion can't ride a
    scalar fold, and DuckDB's list_reduce takes its init from the
    FIRST ELEMENT (acc type = element type), so the state is encoded
    as a 2-element DOUBLE list on both sides — Spark's aggregate folds
    array(y₀, 0) over plain doubles, DuckDB folds over [y, 0] pairs;
    the wrapper adds no arithmetic, and l_t appears twice per step as
    the SAME expression text in both engines. α=β=0.25 are powers of
    two (exact, 1-α exact). Day revenue is an exact-cents sum cast
    once to DOUBLE.

    Scale: one shuffle onto (event_type, day) for the exact-cents
    aggregate, one onto event_type for the fold; per-series state is
    the calendar-bounded day list (the agg_autocorr class). At 100 TB
    the fold composes — carry (l, b) forward as the next window's
    seed, the streaming-checkpoint shape.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            / 100
        ).alias("y")
    )
    a, b1 = HW_ALPHA, 1 - HW_ALPHA
    bb, b2 = HW_BETA, 1 - HW_BETA
    lvl = f"CAST({a} AS DOUBLE) * y + CAST({b1} AS DOUBLE) * (acc[0] + acc[1])"
    fold = (
        "aggregate(slice(ys, 2, size(ys) - 1), "
        "array(ys[0], CAST(0 AS DOUBLE)), "
        f"(acc, y) -> array({lvl}, "
        f"CAST({bb} AS DOUBLE) * (({lvl}) - acc[0])"
        f" + CAST({b2} AS DOUBLE) * acc[1]))"
    )
    series = day.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, y))), s -> s.y)"
        ).alias("ys"),
    )
    # bind the fold ONCE in its own projection — six references from
    # one select would re-embed the interpreted fold per output column
    # (the multiply-referenced-alias gotcha; trivial here but free to
    # avoid)
    lb = F.col("lb")
    return series.select("event_type", "n_days", F.expr(fold).alias("lb")).select(
        "event_type",
        "n_days",
        (F.round(lb[0], 6) + 0.0).alias("level"),
        (F.round(lb[1], 6) + 0.0).alias("trend"),
        (F.round(lb[0] + lb[1], 6) + 0.0).alias("forecast_1"),
        (F.round(lb[0] + 7 * lb[1], 6) + 0.0).alias("forecast_7"),
    )


HW_GAMMA = 0.25  # seasonal smoothing — power of two, exact in binary
HW_PERIOD = 7  # day-of-week seasonality

# --- shared fold-text pieces for the seasonal recursion -------------
# State = 10-double list [t, l, b, s0..s6] (t = absolute day index of
# the NEXT observation, so slot = t % 7 addresses the seasonal entry
# laid down exactly one period earlier). Spark arrays are 0-based,
# DuckDB lists 1-based; the textual skeleton is otherwise identical so
# both engines run the same multiply-add chain in the same order.
_HWS_A, _HWS_A1 = HW_ALPHA, 1 - HW_ALPHA
_HWS_B, _HWS_B1 = HW_BETA, 1 - HW_BETA
_HWS_G, _HWS_G1 = HW_GAMMA, 1 - HW_GAMMA

# Spark (0-based acc, plain-double fold elements y)
_SP_SLOT = "CAST(acc[0] AS INT) % 7"
_SP_SPREV = f"acc[3 + ({_SP_SLOT})]"
_SP_LP = (
    f"CAST({_HWS_A} AS DOUBLE) * (y - {_SP_SPREV})"
    f" + CAST({_HWS_A1} AS DOUBLE) * (acc[1] + acc[2])"
)
_SP_BP = (
    f"CAST({_HWS_B} AS DOUBLE) * (({_SP_LP}) - acc[1])"
    f" + CAST({_HWS_B1} AS DOUBLE) * acc[2]"
)
_SP_SP = (
    f"CAST({_HWS_G} AS DOUBLE) * (y - acc[1] - acc[2])"
    f" + CAST({_HWS_G1} AS DOUBLE) * {_SP_SPREV}"
)
_SP_L0 = "aggregate(slice(ys, 2, 6), ys[0], (a, v) -> a + v) / CAST(7 AS DOUBLE)"
_SP_INIT = (
    f"concat(array(CAST(7 AS DOUBLE), {_SP_L0}, CAST(0 AS DOUBLE)), "
    f"transform(slice(ys, 1, 7), v -> v - ({_SP_L0})))"
)
_SP_HWS_FOLD = (
    f"aggregate(slice(ys, 8, size(ys) - 7), {_SP_INIT}, (acc, y) -> "
    "transform(sequence(0, 9), j -> CASE "
    "WHEN j = 0 THEN acc[0] + CAST(1 AS DOUBLE) "
    f"WHEN j = 1 THEN {_SP_LP} "
    f"WHEN j = 2 THEN {_SP_BP} "
    f"WHEN j = 3 + ({_SP_SLOT}) THEN {_SP_SP} "
    "ELSE acc[j] END))"
)

# DuckDB (1-based a; fold elements are 1-lists [y] because list_reduce
# requires element type == accumulator type — the win_holt_winters
# wrapper trick, widened to the 10-list state)
_DK_SLOT = "CAST(a[1] AS BIGINT) % 7"
_DK_SPREV = f"a[4 + ({_DK_SLOT})]"
_DK_LP = (
    f"CAST({_HWS_A} AS DOUBLE) * (p[1] - {_DK_SPREV})"
    f" + CAST({_HWS_A1} AS DOUBLE) * (a[2] + a[3])"
)
_DK_BP = (
    f"CAST({_HWS_B} AS DOUBLE) * (({_DK_LP}) - a[2])"
    f" + CAST({_HWS_B1} AS DOUBLE) * a[3]"
)
_DK_SP = (
    f"CAST({_HWS_G} AS DOUBLE) * (p[1] - a[2] - a[3])"
    f" + CAST({_HWS_G1} AS DOUBLE) * {_DK_SPREV}"
)
_DK_L0 = "list_reduce(ys[1:7], (a, v) -> a + v) / CAST(7 AS DOUBLE)"
_DK_INIT = (
    f"list_concat([CAST(7 AS DOUBLE), {_DK_L0}, CAST(0 AS DOUBLE)], "
    f"list_transform(ys[1:7], v -> v - ({_DK_L0})))"
)
_DK_HWS_FOLD = (
    f"list_reduce(list_concat([{_DK_INIT}], "
    "list_transform(ys[8:], v -> [v])), "
    "(a, p) -> list_transform([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], j -> CASE "
    "WHEN j = 1 THEN a[1] + CAST(1 AS DOUBLE) "
    f"WHEN j = 2 THEN {_DK_LP} "
    f"WHEN j = 3 THEN {_DK_BP} "
    f"WHEN j = 4 + ({_DK_SLOT}) THEN {_DK_SP} "
    "ELSE a[j] END))"
)


@query(
    "win_holt_winters_seasonal",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               list(y ORDER BY d) AS ys
        FROM day GROUP BY event_type
        HAVING count(*) >= 8
    ),
    st AS (
        SELECT event_type, n_days, {_DK_HWS_FOLD} AS lbs
        FROM series
    )
    SELECT event_type, n_days,
           round(lbs[2], 6) + 0.0 AS level,
           round(lbs[3], 6) + 0.0 AS trend,
           round(lbs[4 + (CAST(lbs[1] AS BIGINT) % 7)], 6) + 0.0
               AS season_next,
           round(lbs[2] + lbs[3]
                 + lbs[4 + (CAST(lbs[1] AS BIGINT) % 7)], 6) + 0.0
               AS forecast_1,
           round(lbs[2] + 7 * lbs[3]
                 + lbs[4 + (CAST(lbs[1] + 6 AS BIGINT) % 7)], 6) + 0.0
               AS forecast_7,
           round(list_max(lbs[4:10]) - list_min(lbs[4:10]), 6) + 0.0
               AS season_range
    FROM st
    """,
)
def win_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE SEASONAL triple exponential smoothing per
    event_type daily-revenue series — win_holt_winters (level+trend)
    completed with the day-of-week component (VERDICT r7 #5):

        l_t = α(y_t − s_{{t−7}}) + (1−α)(l_{{t−1}} + b_{{t−1}})
        b_t = β(l_t − l_{{t−1}}) + (1−β)b_{{t−1}}
        s_t = γ(y_t − l_{{t−1}} − b_{{t−1}}) + (1−γ)s_{{t−7}}

    (the l_{{t−1}}-based seasonal update variant), seeded from the
    first week: l₀ = mean(y₀..y₆) as a sequential fold, b₀ = 0,
    sᵢ = yᵢ − l₀. Output: final level/trend, tomorrow's seasonal
    offset, 1- and 7-day-ahead forecasts ŷ_{{t+h}} = l + h·b +
    s_{{(t+h−1) mod 7}}, and the seasonal amplitude witness
    (max s − min s). Series shorter than 8 days can't complete the
    seed week plus one step and are excluded (HAVING, both sides).

    Determinism (the win_holt_winters pair-state fold, widened to a
    10-double state list [t, l, b, s₀..s₆]): both engines run the
    identical multiply-add chain left-to-right over the day-ordered
    series; the slot index t mod 7 is exact integer arithmetic on a
    small whole number stored in a double; DuckDB's list_reduce takes
    its init from the first element, so the fold rides
    list_concat([init₁₀], [[y]…]) with 1-list elements; l'_t appears
    textually twice per step (inside b'_t) in BOTH engines; α=β=γ=1/4
    are powers of two (exact, 1−γ exact). Day revenue is an
    exact-cents sum cast once to DOUBLE.

    Scale: one shuffle onto (event_type, day), one onto event_type for
    the fold; state is 10 doubles per series regardless of length, so
    at 100 TB the fold composes — checkpoint (l, b, s₀..s₆) and seed
    the next window with it, the streaming-stateful shape.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            / 100
        ).alias("y")
    )
    series = (
        day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr(
                "transform(array_sort(collect_list(struct(d, y))), s -> s.y)"
            ).alias("ys"),
        )
        .filter(F.col("n_days") >= 8)
    )
    lbs = F.col("lbs")
    s_next = lbs[3 + (lbs[0].cast("int") % 7)]
    s_week = lbs[3 + ((lbs[0].cast("int") + 6) % 7)]
    return series.select(
        "event_type", "n_days", F.expr(_SP_HWS_FOLD).alias("lbs")
    ).select(
        "event_type",
        "n_days",
        (F.round(lbs[1], 6) + 0.0).alias("level"),
        (F.round(lbs[2], 6) + 0.0).alias("trend"),
        (F.round(s_next, 6) + 0.0).alias("season_next"),
        (F.round(lbs[1] + lbs[2] + s_next, 6) + 0.0).alias("forecast_1"),
        (F.round(lbs[1] + 7 * lbs[2] + s_week, 6) + 0.0).alias("forecast_7"),
        (
            F.round(
                F.expr("array_max(slice(lbs, 4, 7))")
                - F.expr("array_min(slice(lbs, 4, 7))"),
                6,
            )
            + 0.0
        ).alias("season_range"),
    )


@query(
    "win_rolling_median",
    family="windows",
    oracle="""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS BIGINT) AS dn,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, d,
           CAST(count(*) OVER w AS BIGINT) AS n_frame,
           round(CAST(median(cents) OVER w AS DOUBLE) / 100, 6)
               AS roll_median
    FROM day
    WINDOW w AS (PARTITION BY event_type ORDER BY dn
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-CALENDAR-DAY rolling EXACT median of daily revenue per
    event_type — the robust twin of a rolling mean (one spiky day
    drags a mean for a week; the median shrugs it off), and the
    frame-windowed sibling of agg_median (global) and agg_outlier_mad
    (median-based robustness). Spark evaluates exact
    ``percentile(…, 0.5)`` as a window aggregate ≡ DuckDB's windowed
    ``median`` (probed: both average the two middle values on even
    frames). Inputs are exact integer cents, so every median is a
    whole or half cent — exact in double — and the single /100 + round
    is engine-identical.

    The frame is a RANGE over epoch-day numbers (``dn``), not ROWS:
    on a gapped day grid a ``rowsBetween(-6, 0)`` frame silently spans
    more than 7 calendar days (the VERDICT r7 finding), while
    ``RANGE BETWEEN 6 PRECEDING AND CURRENT ROW`` on ``dn`` admits
    exactly the days in [d−6, d] regardless of gaps — pinned by
    tests/test_corpus_ops.py::test_rolling_median_gapped_grid.

    Scale: the window input is the per-day aggregate (calendar-bounded
    day grid per event_type — the win_interpolate class), never the
    raw corpus; one (event_type, day) exact-cents shuffle, then a
    bounded range-frame scan per partition.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01"))
        .cast("long")
        .alias("dn"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rangeBetween(-6, 0)
    )
    return day.select(
        "event_type",
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_frame"),
        F.round(
            F.expr("percentile(cents, 0.5)").over(w).cast("double") / 100, 6
        ).alias("roll_median"),
    )


KF_Q = 0.25  # process noise (random-walk drift variance) — power of two
KF_R = 4.0  # observation noise variance — power of two
KF_P0 = 1.0  # initial state variance

# Kalman fold-step text, shared shape across engines (state = [x, p]):
#   p' = p + q;  g = p'/(p'+r);  x' = x + g(y − x);  p'' = (1−g)p'
# g appears twice per step as the SAME expression text in both engines
# (the win_holt_winters l'-inside-b' discipline).
_KF_PP = f"(acc[1] + CAST({KF_Q} AS DOUBLE))"
_KF_G = f"({_KF_PP} / ({_KF_PP} + CAST({KF_R} AS DOUBLE)))"
_KF_FOLD = (
    "aggregate(slice(ys, 2, size(ys) - 1), "
    f"array(ys[0], CAST({KF_P0} AS DOUBLE)), "
    f"(acc, y) -> array(acc[0] + {_KF_G} * (y - acc[0]), "
    f"(CAST(1 AS DOUBLE) - {_KF_G}) * {_KF_PP}))"
)
_DKF_PP = f"(a[2] + CAST({KF_Q} AS DOUBLE))"
_DKF_G = f"({_DKF_PP} / ({_DKF_PP} + CAST({KF_R} AS DOUBLE)))"
_DKF_FOLD = (
    "list_reduce(list_transform(list(y ORDER BY d), "
    f"v -> [v, CAST({KF_P0} AS DOUBLE)]), "
    f"(a, p) -> [a[1] + {_DKF_G} * (p[1] - a[1]), "
    f"(CAST(1 AS DOUBLE) - {_DKF_G}) * {_DKF_PP}])"
)


@query(
    "win_kalman_1d",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS y
        FROM events GROUP BY 1, 2
    ),
    st AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               {_DKF_FOLD} AS xp
        FROM day GROUP BY event_type
    )
    SELECT event_type, n_days,
           round(xp[1], 6) + 0.0 AS level,
           round(xp[2], 6) + 0.0 AS variance,
           round(xp[2] / (xp[2] + CAST({KF_R} AS DOUBLE)), 6) + 0.0
               AS steady_gain
    FROM st
    """,
)
def win_kalman_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter (local-level / random-walk-plus-noise model)
    over each event_type's daily-revenue series — the optimal-gain
    sibling of win_ewma: where EWMA smooths with a FIXED α, the Kalman
    gain g_t = p'_t/(p'_t + r) adapts from the tracked state variance,
    starting aggressive (p₀ large relative to r) and converging to the
    steady-state gain — the classic sensor-fusion smoother, and the
    1-D special case of what every tracking pipeline runs.
        predict:  p' = p + q
        update:   g = p'/(p'+r);  x ← x + g(y − x);  p ← (1−g)p'
    Seeded x₀ = y₀, p₀ = {KF_P0}; q = {KF_Q}, r = {KF_R} (powers of
    two). Output: final filtered level, posterior variance, and the
    gain the filter has converged to.

    Determinism (the win_holt_winters pair-state fold): both engines
    run the identical chain left-to-right over the day-ordered series;
    g's expression text appears identically in x' and p'' on both
    sides; every operation is an IEEE add/multiply/divide with no libm
    calls. DuckDB's list_reduce init-from-first-element rides the
    [v, p₀] pair encoding.

    Scale: one (event_type, day) exact-cents shuffle, one event_type
    fold; state is 2 doubles per series — checkpoint (x, p) and
    resume, the streaming-stateful shape.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            / 100
        ).alias("y")
    )
    series = day.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, y))), s -> s.y)"
        ).alias("ys"),
    )
    xp = F.col("xp")
    return series.select(
        "event_type", "n_days", F.expr(_KF_FOLD).alias("xp")
    ).select(
        "event_type",
        "n_days",
        (F.round(xp[0], 6) + 0.0).alias("level"),
        (F.round(xp[1], 6) + 0.0).alias("variance"),
        (
            F.round(xp[1] / (xp[1] + F.lit(KF_R)), 6) + 0.0
        ).alias("steady_gain"),
    )


SPC_RUN = 8  # Western Electric rule 4: this many consecutive same-side days


@query(
    "win_spc_control",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s1,
               CAST(sum(cents * cents) AS BIGINT) AS s2
        FROM day GROUP BY event_type
        HAVING count(*) >= 2
    ),
    z AS (
        SELECT day.event_type, d, cents,
               (CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS zs,
               (CAST(cents AS DOUBLE) > CAST(s1 AS DOUBLE) / n) AS hi
        FROM day JOIN m ON day.event_type = m.event_type
    ),
    runs AS (
        SELECT event_type, d, cents, zs, hi,
               row_number() OVER (PARTITION BY event_type ORDER BY d)
               - row_number() OVER (PARTITION BY event_type, hi ORDER BY d)
                   AS grp
        FROM z
    )
    SELECT event_type, d,
           round(CAST(cents AS DOUBLE) / 100, 6) + 0.0 AS revenue,
           round(zs, 6) + 0.0 AS zscore,
           (abs(zs) > 3) AS rule1_3sigma,
           CAST(count(*) OVER (PARTITION BY event_type, hi, grp)
                AS BIGINT) AS run_len,
           (count(*) OVER (PARTITION BY event_type, hi, grp)
              >= {SPC_RUN}) AS rule4_run
    FROM runs
    """,
)
def win_spc_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-process-control chart (Shewhart + Western Electric
    rules) over each event_type's daily revenue — the rule-based
    monitoring twin of the smoothing family (ewma/kalman watch the
    level; SPC flags the violations a human pages on):
      rule 1: a day beyond μ ± 3σ (|z| > 3);
      rule 4: {SPC_RUN}+ consecutive days on the SAME side of μ
              (a sustained shift too small for rule 1).
    Runs found with gaps-and-islands (rn − rn-within-side), the
    win_streaks machinery; every day is emitted with its z-score, run
    length and both flags — the chart, not just the alarms.

    Determinism: μ and σ come from exact BIGINT cents moments (Σc,
    Σc² — fits int64 with 10⁶ headroom at sf0.1 day volumes), divided
    once into doubles; sqrt is correctly rounded IEEE; the μ
    comparison and |z|>3 are on bit-identical chains. Series with one
    day carry no variance and are excluded (HAVING, both sides).

    Scale: one (event_type, day) exact-cents shuffle; the moment join
    is a broadcast-sized dimension (one row per event_type); the run
    windows partition by (event_type[, side, grp]) over the
    calendar-bounded day grid.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    m = (
        day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s1"),
            F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    z = day.join(F.broadcast(m), "event_type").select(
        "event_type",
        "d",
        "cents",
        (
            (F.col("cents").cast("double") - F.col("s1").cast("double") / F.col("n"))
            / F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("n")
                )
                / (F.col("n") - 1)
            )
        ).alias("zs"),
        (
            F.col("cents").cast("double")
            > F.col("s1").cast("double") / F.col("n")
        ).alias("hi"),
    )
    w_all = Window.partitionBy("event_type").orderBy("d")
    w_side = Window.partitionBy("event_type", "hi").orderBy("d")
    runs = z.select(
        "*",
        (F.row_number().over(w_all) - F.row_number().over(w_side)).alias(
            "grp"
        ),
    )
    w_run = Window.partitionBy("event_type", "hi", "grp")
    return runs.select(
        "event_type",
        "d",
        (F.round(F.col("cents").cast("double") / 100, 6) + 0.0).alias(
            "revenue"
        ),
        (F.round(F.col("zs"), 6) + 0.0).alias("zscore"),
        (F.abs(F.col("zs")) > 3).alias("rule1_3sigma"),
        F.count(F.lit(1)).over(w_run).cast("bigint").alias("run_len"),
        (F.count(F.lit(1)).over(w_run) >= SPC_RUN).alias("rule4_run"),
    )


SHIP_WINDOW_DAYS = 7  # each lineitem keeps its supplier busy this long


@query(
    "win_interval_merge",
    family="windows",
    oracle=f"""
    WITH iv AS (
        SELECT DISTINCT l_suppkey,
               CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
                    AS BIGINT) AS s,
               CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
                    + {SHIP_WINDOW_DAYS} AS BIGINT) AS e
        FROM lineitem
        WHERE l_suppkey <= 100
    ),
    flag AS (
        SELECT l_suppkey, s, e,
               CASE WHEN s > max(e) OVER (
                        PARTITION BY l_suppkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS is_new
        FROM iv
    ),
    blk AS (
        SELECT l_suppkey, s, e,
               sum(is_new) OVER (
                   PARTITION BY l_suppkey ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS block_id
        FROM flag
    )
    SELECT l_suppkey AS suppkey, CAST(block_id AS BIGINT) AS block_id,
           CAST(min(s) AS BIGINT) AS block_start_dn,
           CAST(max(e) AS BIGINT) AS block_end_dn,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(max(e) - min(s) AS BIGINT) AS span_days,
           CAST(sum(e - s) AS BIGINT) AS raw_days
    FROM blk GROUP BY 1, 2
    """,
)
def win_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coalescing (merge overlapping intervals) — the
    interval-algebra primitive behind availability windows, on-call
    coverage and machine-utilization rollups, here over supplier
    shipping windows ([l_shipdate, +{SHIP_WINDOW_DAYS}d] per lineitem,
    first 100 suppliers): overlapping or touching windows merge into
    maximal busy blocks, each reporting its span, its raw (double-
    counted) interval days, and how many shipments it absorbed —
    span vs raw IS the overlap factor.

    The classic sweep: intervals sorted by start; an interval starts a
    NEW block iff its start exceeds the running max end of everything
    before it (a prefix-window max — not lag(e), which misses the
    earlier-long-interval case); block id = prefix sum of the starts.
    Exact integer epoch-day arithmetic end to end; touching intervals
    (s = prev_e) merge, per the >-comparison.

    Scale: one shuffle onto l_suppkey; both windows and the final
    rollup ride the SAME per-supplier partitioning (no second
    exchange); per-supplier interval counts are bounded by that
    supplier's fact rows. The supplier filter is pushed to the parquet
    scan.
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 100)
        .select(
            "l_suppkey",
            F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("s"),
        )
        .select(
            "l_suppkey",
            "s",
            (F.col("s") + SHIP_WINDOW_DAYS).alias("e"),
        )
        .distinct()
    )
    w_prev = (
        Window.partitionBy("l_suppkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = li.select(
        "l_suppkey",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    blk = flag.select(
        "l_suppkey", "s", "e", F.sum("is_new").over(w_run).alias("block_id")
    )
    return blk.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.col("block_id").cast("bigint").alias("block_id"),
    ).agg(
        F.min("s").cast("bigint").alias("block_start_dn"),
        F.max("e").cast("bigint").alias("block_end_dn"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        (F.max("e") - F.min("s")).cast("bigint").alias("span_days"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("raw_days"),
    )


BT_HORIZON = 7  # backtest holdout: the final calendar week per series


@query(
    "win_forecast_backtest",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS BIGINT) AS dn,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2, 3
    ),
    rk AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY dn DESC) AS r_desc,
               count(*) OVER (PARTITION BY event_type) AS n_days
        FROM day
    ),
    train AS (SELECT * FROM rk WHERE r_desc > {BT_HORIZON}
              AND n_days >= {BT_HORIZON} + 2),
    test AS (SELECT * FROM rk WHERE r_desc <= {BT_HORIZON}
             AND n_days >= {BT_HORIZON} + 2),
    agg AS (
        SELECT event_type,
               max_by(cents, dn) AS last_c,
               min_by(cents, dn) AS first_c,
               max(dn) AS last_dn, min(dn) AS first_dn,
               CAST(count(*) AS BIGINT) AS n_train
        FROM train GROUP BY event_type
    ),
    scored AS (
        SELECT t.event_type, 'naive' AS method,
               CAST(t.cents - a.last_c AS DOUBLE) AS err
        FROM test t JOIN agg a ON t.event_type = a.event_type
        UNION ALL
        SELECT t.event_type, 'drift',
               CAST(t.cents AS DOUBLE)
                 - (a.last_c + (t.dn - a.last_dn)
                    * CAST(a.last_c - a.first_c AS DOUBLE)
                      / (a.last_dn - a.first_dn))
        FROM test t JOIN agg a ON t.event_type = a.event_type
        UNION ALL
        SELECT t.event_type, 'seasonal_naive',
               CAST(t.cents - p.cents AS DOUBLE)
        FROM test t JOIN day p
          ON p.event_type = t.event_type AND p.dn = t.dn - 7
    )
    SELECT event_type, method,
           CAST(count(*) AS BIGINT) AS n_eval,
           round(sum(abs(err)) / count(*) / 100, 6) + 0.0 AS mae,
           round(sqrt(sum(err * err) / count(*)) / 100, 6) + 0.0 AS rmse
    FROM scored GROUP BY 1, 2
    """,
)
def win_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest — the eval harness for the forecasting family
    (the llm_retrieval_eval / llm_dedup_eval principle applied to
    win_ewma/holt_winters/kalman's problem): hold out each
    event_type's final {BT_HORIZON} days, forecast them with the three
    classical baselines every method must beat to earn deployment —
    'naive' (last train value), 'drift' (last + h·(last−first)/span),
    'seasonal_naive' (same weekday last week — the M-competition
    yardstick) — and report MAE/RMSE per (series, method).
    Fixed-origin horizon: every seasonal lookback lands in train by
    construction (test day i's d−7 precedes the holdout).

    Determinism: day revenues are exact BIGINT cents; every error is
    an exact subtraction (drift's slope is one division, applied in
    an identical chain); |err| sums exactly in doubles (integer-valued)
    and err² likewise; MAE/RMSE are a division (+ one correctly-
    rounded sqrt) and a /100 rescale. max_by/min_by on (cents, dn)
    are tie-free (dn is unique per series). Series shorter than
    {BT_HORIZON} + 2 days can't fit train + holdout and are excluded
    on both sides.

    Scale: the backtest runs on the (event_type, day) aggregate; the
    train summary is one broadcast-sized row per series, the seasonal
    join is co-partitioned on event_type — nothing here scales with
    the raw corpus beyond the one day-aggregate shuffle.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01"))
        .cast("long")
        .alias("dn"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("dn"))
    wc = Window.partitionBy("event_type")
    rk = day.select(
        "*",
        F.row_number().over(w).alias("r_desc"),
        F.count(F.lit(1)).over(wc).alias("n_days"),
    ).filter(F.col("n_days") >= BT_HORIZON + 2)
    train = rk.filter(F.col("r_desc") > BT_HORIZON)
    test = rk.filter(F.col("r_desc") <= BT_HORIZON)
    agg = train.groupBy("event_type").agg(
        F.expr("max_by(cents, dn)").alias("last_c"),
        F.expr("min_by(cents, dn)").alias("first_c"),
        F.max("dn").alias("last_dn"),
        F.min("dn").alias("first_dn"),
        F.count(F.lit(1)).cast("bigint").alias("n_train"),
    )
    tj = test.join(F.broadcast(agg), "event_type")
    naive = tj.select(
        "event_type",
        F.lit("naive").alias("method"),
        (F.col("cents") - F.col("last_c")).cast("double").alias("err"),
    )
    drift = tj.select(
        "event_type",
        F.lit("drift").alias("method"),
        (
            F.col("cents").cast("double")
            - (
                F.col("last_c")
                + (F.col("dn") - F.col("last_dn"))
                * (F.col("last_c") - F.col("first_c")).cast("double")
                / (F.col("last_dn") - F.col("first_dn"))
            )
        ).alias("err"),
    )
    prev = day.select(
        F.col("event_type").alias("p_et"),
        F.col("dn").alias("p_dn"),
        F.col("cents").alias("p_cents"),
    )
    seasonal = test.join(
        prev,
        (F.col("event_type") == F.col("p_et"))
        & (F.col("p_dn") == F.col("dn") - 7),
    ).select(
        "event_type",
        F.lit("seasonal_naive").alias("method"),
        (F.col("cents") - F.col("p_cents")).cast("double").alias("err"),
    )
    scored = naive.unionAll(drift).unionAll(seasonal)
    return scored.groupBy("event_type", "method").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        (
            F.round(F.sum(F.abs("err")) / F.count(F.lit(1)) / 100, 6) + 0.0
        ).alias("mae"),
        (
            F.round(
                F.sqrt(F.sum(F.col("err") * F.col("err")) / F.count(F.lit(1)))
                / 100,
                6,
            )
            + 0.0
        ).alias("rmse"),
    )


WAU_WINDOW = 7  # trailing calendar days for the rolling active count


@query(
    "win_rolling_wau",
    family="windows",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS BIGINT) AS dn
        FROM events
    ),
    spine AS (SELECT DISTINCT dn FROM ud),
    expanded AS (
        SELECT user_id, dn + g.i AS day
        FROM ud, generate_series(0, {WAU_WINDOW - 1}) AS g(i)
    ),
    wau AS (
        SELECT day AS dn, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM expanded JOIN spine ON expanded.day = spine.dn
        GROUP BY day
    ),
    dau AS (
        SELECT dn, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY dn
    )
    SELECT dau.dn, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) + 0.0
               AS stickiness
    FROM dau JOIN wau ON dau.dn = wau.dn
    """,
)
def win_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {WAU_WINDOW}-day distinct active users per day (WAU)
    next to the daily count (DAU) and the DAU/WAU stickiness ratio —
    the engagement triple every product dashboard leads with, and a
    computation Spark cannot express directly (COUNT(DISTINCT) is not
    a supported window aggregate). The scalable form used here: each
    (user, day) first-class activity fact fans out to the {WAU_WINDOW}
    report days it keeps the user active in (a map-side explode — NO
    range join, NO per-day rescan), then one distinct-count per report
    day. Report days are restricted to days with actual activity (the
    spine), so a corpus gap never invents a row.

    Determinism: everything is exact integer counting over exact
    epoch-day arithmetic; stickiness is one IEEE division.

    Scale: |user-days| × {WAU_WINDOW} map-side rows into a day-keyed
    distinct aggregate (two-level: partial dedup per task, then the
    day shuffle) — linear in activity, never quadratic in the window;
    the window-size explode is THE production pattern for sliding
    distinct counts (the HLL-sketch variant swaps the exact distinct
    for mergeable sketches when report latency matters more than
    exactness — agg_sketch_rollup shows that machinery).
    """
    e = t(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id",
            F.datediff(
                F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01")
            )
            .cast("long")
            .alias("dn"),
        )
        .distinct()
        .persist()  # feeds spine, DAU and the WAU expansion; leaked by
        # the repo persist convention (plan references the cache)
    )
    spine = ud.select("dn").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("dn"), F.col("dn") + (WAU_WINDOW - 1))
        ).alias("day"),
    )
    wau = (
        expanded.join(spine, expanded.day == spine.dn)
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
    )
    dau = ud.groupBy("dn").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    return dau.join(wau, dau.dn == wau.day).select(
        dau.dn.alias("dn"),
        "dau",
        "wau",
        (F.round(F.col("dau").cast("double") / F.col("wau"), 6) + 0.0).alias(
            "stickiness"
        ),
    )


@query(
    "win_history_compress",
    family="windows",
    oracle="""
    WITH ud AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS BIGINT) AS dn,
               event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    mx AS (
        SELECT user_id, dn, max(cnt) AS mc FROM ud GROUP BY 1, 2
    ),
    dom AS (
        SELECT ud.user_id, ud.dn, min(ud.event_type) AS status
        FROM ud JOIN mx ON ud.user_id = mx.user_id AND ud.dn = mx.dn
                        AND ud.cnt = mx.mc
        GROUP BY 1, 2
    ),
    flag AS (
        SELECT user_id, dn, status,
               CASE WHEN lag(dn) OVER w IS NULL
                         OR dn <> lag(dn) OVER w + 1
                         OR status <> lag(status) OVER w
                    THEN 1 ELSE 0 END AS is_new
        FROM dom
        WINDOW w AS (PARTITION BY user_id ORDER BY dn)
    ),
    isl AS (
        SELECT user_id, dn, status,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY dn
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS island
        FROM flag
    )
    SELECT user_id, status,
           CAST(min(dn) AS BIGINT) AS valid_from_dn,
           CAST(max(dn) AS BIGINT) AS valid_to_dn,
           CAST(count(*) AS BIGINT) AS n_days
    FROM isl GROUP BY user_id, status, island
    """,
)
def win_history_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-history compression (SCD2 FROM observations): each
    user's daily dominant event_type is a day-grained snapshot series;
    consecutive days with the same status compress into one validity
    range (valid_from, valid_to) — the op that turns an O(days)
    snapshot table into an O(changes) history table, the other
    direction from etl_scd2 (which APPLIES changes) and join_scd2_pit
    (which QUERIES the result). Ranges split on status change OR on a
    day gap (absence is unknown, not an extension — the conservative
    SCD2 reading).

    Determinism: the per-(user, day) dominant status is the two-level
    exact argmax (max count, then min event_type among ties — the
    llm_dataset_card discipline); islands come from lag-based change
    flags + a prefix sum, all exact integer arithmetic on one
    per-user partitioning.

    Scale: one (user, day, type) count shuffle; the argmax join and
    BOTH windows and the final rollup ride user-keyed partitionings;
    state per user is its day grid. Output is O(changes) — the point.
    """
    e = t(spark, sf_dir, "events")
    ud = e.groupBy(
        "user_id",
        F.datediff(F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01"))
        .cast("long")
        .alias("dn"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    mx = ud.groupBy("user_id", "dn").agg(F.max("cnt").alias("mc"))
    dom = (
        ud.join(mx, ["user_id", "dn"])
        .filter(F.col("cnt") == F.col("mc"))
        .groupBy("user_id", "dn")
        .agg(F.min("event_type").alias("status"))
    )
    w = Window.partitionBy("user_id").orderBy("dn")
    flag = dom.select(
        "user_id",
        "dn",
        "status",
        F.when(
            F.lag("dn").over(w).isNull()
            | (F.col("dn") != F.lag("dn").over(w) + 1)
            | (F.col("status") != F.lag("status").over(w)),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("dn")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = flag.select(
        "user_id",
        "dn",
        "status",
        F.sum("is_new").over(w_run).alias("island"),
    )
    return (
        isl.groupBy("user_id", "status", "island")
        .agg(
            F.min("dn").cast("bigint").alias("valid_from_dn"),
            F.max("dn").cast("bigint").alias("valid_to_dn"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .select(
            "user_id", "status", "valid_from_dn", "valid_to_dn", "n_days"
        )
    )


THETA_ALPHA = 0.25  # SES smoothing on the theta(2) line — power of two

# index-carrying fold: state [i, s_ty] accumulates Σ t·y with t = the
# 1-based position in the day-ordered series (both engines walk the
# same order, so t is identical); values stay exact integers in
# doubles (t·y ≤ n·max_cents ≪ 2^53)
_SP_STY = (
    "aggregate(ys, array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)), "
    "(acc, y) -> array(acc[0] + CAST(1 AS DOUBLE), "
    "acc[1] + (acc[0] + CAST(1 AS DOUBLE)) * y))[1]"
)
_DK_STY = (
    "list_reduce(list_concat([[CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]], "
    "list_transform(ys, v -> [v, CAST(0 AS DOUBLE)])), "
    "(a, p) -> [a[1] + CAST(1 AS DOUBLE), "
    "a[2] + (a[1] + CAST(1 AS DOUBLE)) * p[1]])[2]"
)

# SES over the theta(2) line z_t = 2·y_t − (a + b·t): state [i, L],
# seeded L₁ = z₁ = 2·y₁ − a − b (t starts at 1); a and b are bound
# ATTRIBUTES from the projection below, referenced inside the lambda
_SP_SES = (
    "aggregate(slice(ys, 2, size(ys) - 1), "
    "array(CAST(1 AS DOUBLE), "
    " CAST(2 AS DOUBLE) * ys[0] - a - b), "
    f"(acc, y) -> array(acc[0] + CAST(1 AS DOUBLE), "
    f"CAST({THETA_ALPHA} AS DOUBLE) * (CAST(2 AS DOUBLE) * y - a"
    f" - b * (acc[0] + CAST(1 AS DOUBLE)))"
    f" + CAST({1 - THETA_ALPHA} AS DOUBLE) * acc[1]))[1]"
)
_DK_SES = (
    "list_reduce(list_concat("
    "[[CAST(1 AS DOUBLE), CAST(2 AS DOUBLE) * ys[1] - a - b]], "
    "list_transform(ys[2:], v -> [v, CAST(0 AS DOUBLE)])), "
    f"(acc, p) -> [acc[1] + CAST(1 AS DOUBLE), "
    f"CAST({THETA_ALPHA} AS DOUBLE) * (CAST(2 AS DOUBLE) * p[1] - a"
    f" - b * (acc[1] + CAST(1 AS DOUBLE)))"
    f" + CAST({1 - THETA_ALPHA} AS DOUBLE) * acc[2]])[2]"
)


@query(
    "win_theta_forecast",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               list(y ORDER BY d) AS ys
        FROM day GROUP BY event_type
        HAVING count(*) >= 3
    ),
    mom AS (
        SELECT event_type, n_days, ys,
               {_DK_STY} AS sty,
               CAST(n_days AS DOUBLE) * (n_days + 1) / 2 AS st,
               CAST(n_days AS DOUBLE) * (n_days + 1) * (2 * n_days + 1)
                   / 6 AS stt,
               list_reduce(ys, (x, v) -> x + v) AS sy
        FROM series
    ),
    fit AS (
        SELECT event_type, n_days, ys,
               (n_days * sty - st * sy) / (n_days * stt - st * st) AS b,
               (sy - (n_days * sty - st * sy)
                     / (n_days * stt - st * st) * st) / n_days AS a
        FROM mom
    ),
    ses AS (
        SELECT event_type, n_days, a, b, {_DK_SES} AS l2
        FROM fit
    )
    SELECT event_type, n_days,
           round(b, 6) + 0.0 AS slope,
           round(a, 6) + 0.0 AS intercept,
           round((l2 + a + b * (n_days + 1)) / 2, 6) + 0.0 AS theta_f1,
           round((l2 + a + b * (n_days + 7)) / 2, 6) + 0.0 AS theta_f7
    FROM ses
    """,
)
def win_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner) per event_type daily-revenue series: the
    series decomposes into the θ=0 line (the OLS linear trend, all
    long-run signal) and the θ=2 line z_t = 2y_t − (a + b·t) (double
    the local curvature); the h-step forecast averages the trend
    extrapolation with an SES forecast of the θ=2 line — which is why
    Theta beat every smoothing method it generalizes. Output: the
    fitted trend and the 1-/7-day-ahead theta forecasts. The capstone
    of the forecast shelf (ewma → holt → holt-winters → kalman →
    backtest), and the next candidate system for
    win_forecast_backtest's holdout harness.

    Determinism: Σt and Σt² are closed forms of n; Σy is an exact
    cents sum; Σt·y rides an index-carrying [i, Σty] fold (exact
    integers in doubles); slope/intercept are short identical division
    chains; the SES fold references a and b as BOUND ATTRIBUTES (one
    projection below — the multiply-referenced-alias discipline) and
    α = 1/4 is a power of two. DuckDB's list_reduce init-from-first
    rides a prepended state element (the established encoding);
    series shorter than 3 days can't fit a line + one SES step and
    are excluded on both sides.

    Scale: one (event_type, day) shuffle, one event_type fold; state
    is O(1) per series — the streaming-checkpoint shape like its
    siblings.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            / 100
        ).alias("y")
    )
    series = (
        day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr(
                "transform(array_sort(collect_list(struct(d, y))), s -> s.y)"
            ).alias("ys"),
        )
        .filter(F.col("n_days") >= 3)
    )
    mom = series.select(
        "event_type",
        "n_days",
        "ys",
        F.expr(_SP_STY).alias("sty"),
        (F.col("n_days").cast("double") * (F.col("n_days") + 1) / 2).alias(
            "st"
        ),
        (
            F.col("n_days").cast("double")
            * (F.col("n_days") + 1)
            * (2 * F.col("n_days") + 1)
            / 6
        ).alias("stt"),
        F.expr(
            "aggregate(ys, CAST(0 AS DOUBLE), (x, v) -> x + v)"
        ).alias("sy"),
    )
    b_expr = (F.col("n_days") * F.col("sty") - F.col("st") * F.col("sy")) / (
        F.col("n_days") * F.col("stt") - F.col("st") * F.col("st")
    )
    fit = mom.select(
        "event_type",
        "n_days",
        "ys",
        b_expr.alias("b"),
        ((F.col("sy") - b_expr * F.col("st")) / F.col("n_days")).alias("a"),
    )
    ses = fit.select(
        "event_type", "n_days", "a", "b", F.expr(_SP_SES).alias("l2")
    )
    return ses.select(
        "event_type",
        "n_days",
        (F.round(F.col("b"), 6) + 0.0).alias("slope"),
        (F.round(F.col("a"), 6) + 0.0).alias("intercept"),
        (
            F.round(
                (F.col("l2") + F.col("a") + F.col("b") * (F.col("n_days") + 1))
                / 2,
                6,
            )
            + 0.0
        ).alias("theta_f1"),
        (
            F.round(
                (F.col("l2") + F.col("a") + F.col("b") * (F.col("n_days") + 7))
                / 2,
                6,
            )
            + 0.0
        ).alias("theta_f7"),
    )


BOLL_WIN = 19  # calendar days back (20-day band incl. current)
BOLL_K = 2  # band half-width in rolling sigmas


@query(
    "win_bollinger",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS dn,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2, 3
    ),
    frames AS (
        SELECT event_type, d, cents,
               CAST(count(*) OVER w AS BIGINT) AS n_frame,
               CAST(sum(cents) OVER w AS BIGINT) AS s1,
               CAST(sum(cents * cents) OVER w AS BIGINT) AS s2
        FROM day
        WINDOW w AS (PARTITION BY event_type ORDER BY dn
                     RANGE BETWEEN {BOLL_WIN} PRECEDING AND CURRENT ROW)
    ),
    b AS (
        SELECT event_type, d, cents, n_frame,
               CAST(s1 AS DOUBLE) / CAST(n_frame AS DOUBLE) AS mid_c,
               CASE WHEN n_frame > 1 THEN
                   sqrt((CAST(s2 AS DOUBLE)
                         - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                           / CAST(n_frame AS DOUBLE))
                        / CAST(n_frame - 1 AS DOUBLE))
               ELSE CAST(0 AS DOUBLE) END AS sd_c
        FROM frames
    )
    SELECT event_type, d, n_frame,
           round(CAST(cents AS DOUBLE) / CAST(100 AS DOUBLE), 6)
               + CAST(0 AS DOUBLE) AS close,
           round(mid_c / CAST(100 AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS mid,
           round((mid_c + CAST({BOLL_K} AS DOUBLE) * sd_c)
                 / CAST(100 AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS upper,
           round((mid_c - CAST({BOLL_K} AS DOUBLE) * sd_c)
                 / CAST(100 AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS lower,
           CAST(cents AS DOUBLE) > mid_c + CAST({BOLL_K} AS DOUBLE) * sd_c
             OR CAST(cents AS DOUBLE) < mid_c - CAST({BOLL_K} AS DOUBLE)
                * sd_c AS breach
    FROM b
    """,
)
def win_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over each event_type's daily revenue: rolling
    {BOLL_WIN + 1}-calendar-day mean ± {BOLL_K}σ with a breach flag —
    the ROLLING-limits control chart complementing win_spc_control's
    global Shewhart limits (a drifting series re-centers the band;
    SPC holds the baseline fixed) and win_rolling_median's robust
    center (this one is the classic mean/σ form every trading/metrics
    dashboard draws).

    Determinism: the frame is calendar-exact — RANGE over the epoch-day
    number, the win_rolling_median discipline, so gapped days shrink
    the window identically in both engines; frame moments (Σc, Σc²)
    accumulate as exact BIGINT cents inside the frame; mean/σ derive in
    one fixed-order double chain; sqrt is the correctly-rounded libm
    call. Single-day frames define σ = 0 (band collapses to the point;
    breach false).

    Scale: window input is the (event_type, day) aggregate — map-side
    combined, calendar-bounded — then one bounded range-frame scan per
    partition; never the raw corpus.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01")
        )
        .cast("long")
        .alias("dn"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rangeBetween(-BOLL_WIN, 0)
    )
    frames = day.select(
        "event_type",
        "d",
        "cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_frame"),
        F.sum("cents").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents"))
        .over(w)
        .cast("bigint")
        .alias("s2"),
    )
    mid_c = F.col("s1").cast("double") / F.col("n_frame").cast("double")
    sd_c = F.when(
        F.col("n_frame") > 1,
        F.sqrt(
            (
                F.col("s2").cast("double")
                - (F.col("s1").cast("double") * F.col("s1").cast("double"))
                / F.col("n_frame").cast("double")
            )
            / (F.col("n_frame") - 1).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    b = frames.select(
        "event_type",
        "d",
        "cents",
        "n_frame",
        mid_c.alias("mid_c"),
        sd_c.alias("sd_c"),
    )
    up = F.col("mid_c") + BOLL_K * F.col("sd_c")
    lo = F.col("mid_c") - BOLL_K * F.col("sd_c")
    return b.select(
        "event_type",
        "d",
        "n_frame",
        (F.round(F.col("cents").cast("double") / 100, 6) + 0.0).alias(
            "close"
        ),
        (F.round(F.col("mid_c") / 100, 6) + 0.0).alias("mid"),
        (F.round(up / 100, 6) + 0.0).alias("upper"),
        (F.round(lo / 100, 6) + 0.0).alias("lower"),
        (
            (F.col("cents").cast("double") > up)
            | (F.col("cents").cast("double") < lo)
        ).alias("breach"),
    )


# --- RSI (Wilder smoothing) — round 11 -----------------------------------

RSI_N = 14


@query(
    "win_rsi",
    family="windows",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, count(*) AS n_days, list(y ORDER BY d) AS ys
        FROM day GROUP BY event_type
    ),
    gl AS (
        SELECT event_type, n_days,
               list_transform(generate_series(2, len(ys)),
                   i -> [greatest(ys[i] - ys[i-1], CAST(0 AS DOUBLE)),
                         greatest(ys[i-1] - ys[i], CAST(0 AS DOUBLE))]) AS g
        FROM series WHERE len(ys) >= 2
    ),
    folded AS (
        SELECT event_type, n_days,
               list_reduce(g, (a, p) -> [
                   (a[1] * CAST({RSI_N - 1} AS DOUBLE) + p[1])
                       / CAST({RSI_N} AS DOUBLE),
                   (a[2] * CAST({RSI_N - 1} AS DOUBLE) + p[2])
                       / CAST({RSI_N} AS DOUBLE)]) AS s
        FROM gl
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(s[1], 6) + 0.0 AS avg_gain,
           round(s[2], 6) + 0.0 AS avg_loss,
           round(CASE WHEN s[2] = 0 THEN CAST(100 AS DOUBLE)
                      ELSE CAST(100 AS DOUBLE)
                         - CAST(100 AS DOUBLE)
                           / (CAST(1 AS DOUBLE) + s[1] / s[2]) END,
                 6) + 0.0 AS rsi
    FROM folded
    """,
)
def win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Wilder's smoothing, n = RSI_N = 14) over
    each event_type's daily-revenue series — the momentum gauge
    completing the technical shelf next to win_bollinger (volatility
    bands), win_ewma (level) and win_theta_forecast (trend): is the
    series' recent movement gain- or loss-dominated.

    Each day-over-day delta is encoded as its (gain, loss) pair up
    front, so DuckDB's list_reduce seeding (init = FIRST ELEMENT, acc
    type = element type — the win_holt_winters mechanism) makes the
    seed exactly Wilder's first observation; both engines then run the
    identical multiply-add chain (a·(n−1) + x)/n left-to-right over
    the day-ordered deltas. avg_loss = 0 defines RSI = 100 (the
    conventional all-gains limit, shared CASE in both engines).

    Scale: window input is the (event_type, day) aggregate — map-side
    combined, calendar-bounded — then one in-row fold per series; at
    100 TB the fold composes exactly like win_ewma (carry [avg_gain,
    avg_loss] forward as the next window's seed).
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            / 100
        ).alias("y")
    )
    series = day.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(d, y))), s -> s.y)"
        ).alias("ys"),
    ).filter(F.size("ys") >= 2)
    gl = (
        "transform(sequence(1, size(ys) - 1), "
        "i -> array(greatest(ys[i] - ys[i-1], CAST(0 AS DOUBLE)), "
        "greatest(ys[i-1] - ys[i], CAST(0 AS DOUBLE))))"
    )
    fold = (
        f"aggregate(slice(_gl, 2, size(_gl) - 1), _gl[0], "
        f"(a, p) -> array("
        f"(a[0] * CAST({RSI_N - 1} AS DOUBLE) + p[0])"
        f" / CAST({RSI_N} AS DOUBLE), "
        f"(a[1] * CAST({RSI_N - 1} AS DOUBLE) + p[1])"
        f" / CAST({RSI_N} AS DOUBLE)))"
    )
    s = F.col("s")
    rsi = F.when(s[1] == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + s[0] / s[1])
    )
    return (
        series.select("event_type", "n_days", F.expr(gl).alias("_gl"))
        .select("event_type", "n_days", F.expr(fold).alias("s"))
        .select(
            "event_type",
            "n_days",
            (F.round(s[0], 6) + 0.0).alias("avg_gain"),
            (F.round(s[1], 6) + 0.0).alias("avg_loss"),
            (F.round(rsi, 6) + 0.0).alias("rsi"),
        )
    )


@query(
    "win_seasonality_strength",
    family="windows",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    tr AS (
        SELECT day, c,
               CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
                   AS dow,
               CAST(sum(c) OVER w AS BIGINT) AS t_c,
               CAST(count(*) OVER w AS BIGINT) AS n_t
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    ),
    det AS (
        SELECT day, c, dow,
               CASE WHEN n_t = 3 THEN 3 * c - t_c END AS d3
        FROM tr
    ),
    seas AS (
        SELECT dow, CAST(sum(d3) AS BIGINT) AS s_num,
               CAST(count(d3) AS BIGINT) AS s_den
        FROM det GROUP BY dow
    ),
    comp AS (
        SELECT det.day,
               det.d3 / 300.0 AS sr,
               det.d3 / 300.0
                 - CAST(s_num AS DOUBLE) / s_den / 300.0 AS r,
               det.c / 100.0
                 - CAST(s_num AS DOUBLE) / s_den / 300.0 AS t_r
        FROM det JOIN seas ON det.dow = seas.dow
        WHERE det.d3 IS NOT NULL
    ),
    sums AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list_sum(list(r ORDER BY day)) AS f_r,
               list_sum(list(r * r ORDER BY day)) AS f_r2,
               list_sum(list(sr ORDER BY day)) AS f_sr,
               list_sum(list(sr * sr ORDER BY day)) AS f_sr2,
               list_sum(list(t_r ORDER BY day)) AS f_t,
               list_sum(list(t_r * t_r ORDER BY day)) AS f_t2
        FROM comp
    )
    SELECT n AS n_days,
           round(greatest(CAST(0 AS DOUBLE),
                 1 - (f_r2 / n - (f_r / n) * (f_r / n))
                   / (f_sr2 / n - (f_sr / n) * (f_sr / n))), 6) + 0.0
               AS seasonal_strength,
           round(greatest(CAST(0 AS DOUBLE),
                 1 - (f_r2 / n - (f_r / n) * (f_r / n))
                   / (f_t2 / n - (f_t / n) * (f_t / n))), 6) + 0.0
               AS trend_strength
    FROM sums
    """,
)
def win_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend / seasonality STRENGTH of the daily revenue series
    (Hyndman & Athanasopoulos FPP §3.4): F_seasonal = max(0,
    1 − Var(R)/Var(S+R)) and F_trend = max(0, 1 − Var(R)/Var(T+R))
    over win_seasonal_decompose's components — the single-number
    "does this series even HAVE seasonality worth modeling" gate a
    forecasting pipeline runs before choosing between win_ewma /
    win_theta_forecast / win_holt_winters_seasonal.

    Determinism: the components reuse the decompose op's all-integer
    staging (exact cents, exact BIGINT frame sums, d3 = 3c − Σframe)
    so every per-day double is bit-identical cross-engine; the six
    variance moments then fold in EXPLICIT day order (list_sum(list(x
    ORDER BY day)) ≡ aggregate(array_sort(...))); each strength is
    one division of those sums. Var = E[x²] − E[x]², same expression
    text both sides. A zero variance denominator yields ±inf and
    greatest(0, ·) clamps identically in both engines.

    Scale: one day-grain aggregate, the calendar-bounded trend window
    (ALLOW_GLOBAL_WINDOW class), a 7-row broadcast, then one 1-row
    fold — nothing corpus-sized past the first aggregate.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("c")
    )
    w = Window.orderBy("day").rowsBetween(-1, 1)
    tr = daily.select(
        "day",
        "c",
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7)
        .cast("bigint")
        .alias("dow"),
        F.sum("c").over(w).cast("bigint").alias("t_c"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_t"),
    )
    det = tr.select(
        "day",
        "c",
        "dow",
        F.when(F.col("n_t") == 3, 3 * F.col("c") - F.col("t_c")).alias("d3"),
    )
    seas = det.groupBy("dow").agg(
        F.sum("d3").cast("bigint").alias("s_num"),
        F.count("d3").cast("bigint").alias("s_den"),
    )
    s_mean = F.col("s_num").cast("double") / F.col("s_den") / F.lit(300.0)
    comp = (
        det.join(F.broadcast(seas), "dow")
        .filter(F.col("d3").isNotNull())
        .select(
            "day",
            (F.col("d3") / F.lit(300.0)).alias("sr"),
            (F.col("d3") / F.lit(300.0) - s_mean).alias("r"),
            (F.col("c") / F.lit(100.0) - s_mean).alias("t_r"),
        )
    )

    def osum(x: str) -> F.Column:
        return F.expr(
            f"aggregate(array_sort(collect_list(struct(day, {x} AS x))),"
            " CAST(0 AS DOUBLE), (a, e) -> a + e.x)"
        )

    sums = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        osum("r").alias("f_r"),
        osum("r * r").alias("f_r2"),
        osum("sr").alias("f_sr"),
        osum("sr * sr").alias("f_sr2"),
        osum("t_r").alias("f_t"),
        osum("t_r * t_r").alias("f_t2"),
    )
    n = F.col("n")

    def strength(s2: str, s1: str) -> F.Column:
        var_r = F.col("f_r2") / n - (F.col("f_r") / n) * (F.col("f_r") / n)
        var_d = F.col(s2) / n - (F.col(s1) / n) * (F.col(s1) / n)
        return F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_d), 6
        ) + 0.0

    return sums.select(
        n.alias("n_days"),
        strength("f_sr2", "f_sr").alias("seasonal_strength"),
        strength("f_t2", "f_t").alias("trend_strength"),
    )


@query(
    "win_croston",
    family="windows",
    oracle="""
    WITH act AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS z,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS DOUBLE) AS dn
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    s AS (
        SELECT user_id, count(*) AS n_active,
               list(z ORDER BY day) AS zs,
               list(dn ORDER BY day) AS ds
        FROM act GROUP BY user_id
    ),
    f AS (
        SELECT user_id, n_active,
               list_reduce(zs, (a, x) -> a * CAST(0.75 AS DOUBLE)
                                       + x * CAST(0.25 AS DOUBLE)) AS zh,
               list_reduce(
                   list_transform(generate_series(2, len(ds)),
                                  i -> ds[i] - ds[i-1]),
                   (a, x) -> a * CAST(0.75 AS DOUBLE)
                           + x * CAST(0.25 AS DOUBLE)) AS qh
        FROM s WHERE n_active >= 2
    )
    SELECT user_id, CAST(n_active AS BIGINT) AS n_active_days,
           round(zh, 6) + 0.0 AS size_hat,
           round(qh, 6) + 0.0 AS interval_hat,
           round(zh / qh, 6) + 0.0 AS demand_rate
    FROM f
    """,
)
def win_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand, per user over purchase
    events (Croston 1972): smooth the nonzero demand SIZES and the
    INTER-ARRIVAL intervals separately (EWMA, α = 0.25 — an exact
    power of two, the win_ewma discipline), forecast = size/interval
    demand per day. The forecasting shelf's sparse-series member: ewma
    / holt / holt-winters / theta / rsi all assume a dense series;
    per-user purchases are the archetypal intermittent one (most days
    zero), where naive smoothing of the zero-filled series
    systematically under-forecasts — the exact bias Croston removes.

    Determinism: active-day sizes are exact cents → one division;
    intervals are exact day diffs cast to double; BOTH folds seed with
    their first element (Spark aggregate-over-slice ≡ DuckDB
    list_reduce first-element seeding) and run the identical
    multiply-add chain in day order. Users with a single active day
    have no interval and are excluded (n_active ≥ 2, both engines).

    Scale: one shuffle to (user, day), one to per-user lists bounded
    by the user's ACTIVE days (sparse by definition — far smaller than
    the calendar); the folds are in-row. The streaming twin carries
    (ẑ, q̂, last_day) as state exactly like win_ewma's seed-forward
    composition.
    """
    e = t(spark, sf_dir, "events")
    act = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("double")
                / 100
            ).alias("z")
        )
        .select(
            "user_id",
            "day",
            "z",
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            .cast("double")
            .alias("dn"),
        )
    )
    s = act.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, z))), s -> s.z)"
        ).alias("zs"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, dn))), s -> s.dn)"
        ).alias("ds"),
    ).filter(F.col("n_active") >= 2)
    ewma = (
        "aggregate(slice({v}, 2, size({v}) - 1), {v}[0], "
        "(a, x) -> a * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE))"
    )
    staged = s.select(
        "user_id",
        "n_active",
        "zs",
        F.expr(
            "transform(sequence(1, size(ds) - 1), i -> ds[i] - ds[i-1])"
        ).alias("_iv"),
    ).select(
        "user_id",
        "n_active",
        F.expr(ewma.format(v="zs")).alias("zh"),
        F.expr(ewma.format(v="_iv")).alias("qh"),
    )
    return staged.select(
        "user_id",
        F.col("n_active").alias("n_active_days"),
        (F.round("zh", 6) + 0.0).alias("size_hat"),
        (F.round("qh", 6) + 0.0).alias("interval_hat"),
        (F.round(F.col("zh") / F.col("qh"), 6) + 0.0).alias("demand_rate"),
    )
