"""Statistical profile operators, round 3 (SURVEY.md §2.4-B
extensions): distribution entropy, two-sample KS distance, a pairwise
correlation matrix, series autocorrelation, and PSI drift between
partitions — the data-quality/monitoring layer of a production
pipeline.

Determinism discipline (same as agg_regr/agg_welch_t): moments
accumulate as exact decimals or exact integers; estimators derive in
closed form with fixed-operand-order double expressions; multi-term
double sums fold in explicit key order (the list_sum(list(x ORDER BY
k)) ≡ aggregate(array_sort(collect_list(struct(k, x)))) identity);
everything rounds to 6 dp at the edge.

Caching policy: multi-consumer intermediates (KS grouped counts via
ordered_prefix) stay persisted until the session evicts them — the
returned DataFrame references the cache, and for ordered_prefix the
cache is load-bearing for rank correctness (see _util.ordered_prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import (
    _ntile_from_rank,
    dec,
    dsum,
    ordered_prefix,
    t,
)
from local_etl_spark.registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

N_COHORTS = 8

# entropy = -Σ p ln p over the event-type mix, terms added in fixed
# alphabetical type order so both engines evaluate the identical chain
_ENT_TERMS_SQL = " + ".join(
    f"(CASE WHEN c{i} > 0 THEN (c{i} * 1.0 / n) * ln(c{i} * 1.0 / n) "
    "ELSE 0.0 END)"
    for i in range(len(EVENT_TYPES))
)
_ENT_COUNTS_SQL = ", ".join(
    f"sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS c{i}"
    for i, et in enumerate(EVENT_TYPES)
)


@query(
    "agg_entropy",
    family="aggregations",
    oracle=f"""
    WITH c AS (
        SELECT user_id % {N_COHORTS} AS cohort,
               count(*) AS n, {_ENT_COUNTS_SQL}
        FROM events
        GROUP BY 1
    )
    SELECT cohort, CAST(n AS BIGINT) AS n_events,
           round(-({_ENT_TERMS_SQL}), 6) AS entropy
    FROM c
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per user cohort.

    The behavioural-diversity profile: a cohort whose entropy collapses
    is dominated by one event type (bot traffic, an error storm). One
    partial+final hash aggregate — the shuffle payload is 6 counters
    per cohort; the entropy itself is a fixed-order 5-term expression
    over the pivoted counts (0·ln 0 := 0 guarded per term), so the
    result is bit-identical across engines. Scale: group count = cohort
    count, independent of data volume.
    """
    e = t(spark, sf_dir, "events")
    counts = [
        F.sum(F.when(F.col("event_type") == et, 1).otherwise(0)).alias(f"c{i}")
        for i, et in enumerate(EVENT_TYPES)
    ]
    g = e.groupBy((F.col("user_id") % N_COHORTS).alias("cohort")).agg(
        F.count(F.lit(1)).alias("n"), *counts
    )
    n = F.col("n")

    def term(i: int) -> F.Column:
        p = F.col(f"c{i}") * F.lit(1.0) / n
        return F.when(F.col(f"c{i}") > 0, p * F.log(p)).otherwise(F.lit(0.0))

    ent = term(0)
    for i in range(1, len(EVENT_TYPES)):
        ent = ent + term(i)
    return g.select(
        "cohort",
        n.cast("bigint").alias("n_events"),
        F.round(-ent, 6).alias("entropy"),
    )


@query(
    "agg_ks_test",
    family="aggregations",
    oracle="""
    WITH s AS (
        SELECT value, event_type FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    c AS (
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        FROM s GROUP BY value
    ),
    cum AS (
        SELECT value,
               sum(c1) OVER (ORDER BY value) AS a,
               sum(c2) OVER (ORDER BY value) AS b
        FROM c
    ),
    tot AS (
        SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2
        FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(max(abs(a * 1.0 / n1 - b * 1.0 / n2)), 6) AS ks_d
    FROM cum CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance (click vs purchase value
    distributions): D = max |F₁(x) − F₂(x)| over the pooled support.

    Exact ECDFs via cumulative integer counts over the grouped distinct
    values — each ECDF evaluation is ONE double division (correctly
    rounded), |·| and max are exact, so D matches across engines
    bit-for-bit. The cumulative counts come from ``ordered_prefix``
    (range-partitioned prefix sums over the DISTINCT values, offsets
    broadcast back) — no single-partition window, so the exact form
    survives a value grid of any cardinality.
    """
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    # ordered_prefix persists the grouped counts; both the prefix sums
    # and the totals derive from them — one events scan total
    c = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "c2"
        ),
    )
    pref, _n = ordered_prefix(
        c, ["value"], prefix=(("c1", "sum", "a"), ("c2", "sum", "b"))
    )
    cum = pref.select("a", "b")
    # totals derive from the grouped counts, NOT the raw stream — a
    # second events scan would double the dominant cost at scale
    tot = pref.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    return (
        cum.join(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("a") * F.lit(1.0) / F.col("n1")
                        - F.col("b") * F.lit(1.0) / F.col("n2")
                    )
                ),
                6,
            ).alias("ks_d")
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            "ks_d",
        )
    )


# The three profiled lineitem measures as exact INTEGERS (quantity is
# integral, price floors to whole dollars, discount is 2 dp → cents):
# Pearson is invariant under positive rescaling, so integer moments
# give the identical correlation while avoiding the BigDecimal multiply
# slow path entirely (measured 1.8× on the one-pass aggregate). Sums
# accumulate exactly (HUGEINT / DECIMAL(28,0)) and convert to double
# once — both engines round the same exact integer identically.
_CORR_X_SQL = "CAST(l_quantity AS BIGINT)"
_CORR_Y_SQL = "CAST(floor(l_extendedprice) AS BIGINT)"
_CORR_Z_SQL = "CAST(round(l_discount * 100) AS BIGINT)"


def _corr_sql(sx: str, sy: str, sxx: str, syy: str, sxy: str) -> str:
    return (
        f"round((n * {sxy} - {sx} * {sy})"
        f" / sqrt((n * {sxx} - {sx} * {sx}) * (n * {syy} - {sy} * {sy})), 6)"
    )


@query(
    "agg_corr_matrix",
    family="aggregations",
    oracle=f"""
    WITH m AS (
        SELECT count(*) * 1.0 AS n,
               CAST(sum({_CORR_X_SQL}) AS DOUBLE) AS sx,
               CAST(sum({_CORR_X_SQL} * {_CORR_X_SQL}) AS DOUBLE) AS sxx,
               CAST(sum({_CORR_Y_SQL}) AS DOUBLE) AS sy,
               CAST(sum({_CORR_Y_SQL} * {_CORR_Y_SQL}) AS DOUBLE) AS syy,
               CAST(sum({_CORR_Z_SQL}) AS DOUBLE) AS sz,
               CAST(sum({_CORR_Z_SQL} * {_CORR_Z_SQL}) AS DOUBLE) AS szz,
               CAST(sum({_CORR_X_SQL} * {_CORR_Y_SQL}) AS DOUBLE) AS sxy,
               CAST(sum({_CORR_X_SQL} * {_CORR_Z_SQL}) AS DOUBLE) AS sxz,
               CAST(sum({_CORR_Y_SQL} * {_CORR_Z_SQL}) AS DOUBLE) AS syz
        FROM lineitem
    )
    SELECT 'quantity~price' AS pair,
           {_corr_sql('sx', 'sy', 'sxx', 'syy', 'sxy')} AS corr
    FROM m
    UNION ALL
    SELECT 'quantity~discount',
           {_corr_sql('sx', 'sz', 'sxx', 'szz', 'sxz')}
    FROM m
    UNION ALL
    SELECT 'price~discount',
           {_corr_sql('sy', 'sz', 'syy', 'szz', 'syz')}
    FROM m
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over three lineitem measures
    (quantity, floored-k$ price, discount), flattened to scalar
    (pair, corr) rows for driver-canon safety.

    ONE aggregation pass computes all nine cross-moments as exact
    integer sums (the shuffle payload is ~80 bytes total — the corr of
    100 TB is a single combine tree); each correlation then derives in
    closed form with fixed-operand-order double ops, identical text on
    both engines. Integer measures (Pearson is scale-invariant, so
    dollars/cents give the identical correlation as k$/fractions) keep
    the per-row products in plain long multiplication — 1.8× faster
    than the BigDecimal multiply path — while DECIMAL(28,0)/HUGEINT
    accumulators keep the sums exact far past int64.
    """
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.floor("l_extendedprice").cast("bigint")
    z = F.round(F.col("l_discount") * 100).cast("bigint")

    def dmom(c):
        # DECIMAL(28,0) accumulator: exact int128 headroom past the
        # BIGINT overflow point (Σ price² ≈ 3e16 at sf0.1, 100× more
        # per 100× rows), converted to double once
        return F.sum(c.cast("decimal(28,0)")).cast("double")

    m = li.agg(
        (F.count(F.lit(1)) * F.lit(1.0)).alias("n"),
        dmom(x).alias("sx"),
        dmom(x * x).alias("sxx"),
        dmom(y).alias("sy"),
        dmom(y * y).alias("syy"),
        dmom(z).alias("sz"),
        dmom(z * z).alias("szz"),
        dmom(x * y).alias("sxy"),
        dmom(x * z).alias("sxz"),
        dmom(y * z).alias("syz"),
    )
    n = F.col("n")

    def corr(sx, sy, sxx, syy, sxy):
        sx, sy, sxx, syy, sxy = (F.col(c) for c in (sx, sy, sxx, syy, sxy))
        return F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        )

    pairs = m.select(
        F.array(
            F.struct(
                F.lit("quantity~price").alias("pair"),
                corr("sx", "sy", "sxx", "syy", "sxy").alias("corr"),
            ),
            F.struct(
                F.lit("quantity~discount").alias("pair"),
                corr("sx", "sz", "sxx", "szz", "sxz").alias("corr"),
            ),
            F.struct(
                F.lit("price~discount").alias("pair"),
                corr("sy", "sz", "syy", "szz", "syz").alias("corr"),
            ),
        ).alias("rows")
    )
    return pairs.select(F.inline("rows"))


@query(
    "agg_autocorr",
    family="aggregations",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS c
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT c, lag(c) OVER (ORDER BY day) AS pc FROM d
    ),
    m AS (
        SELECT count(*) * 1.0 AS n,
               CAST(sum(c) AS DOUBLE) AS sx,
               CAST(sum(c * c) AS DOUBLE) AS sxx,
               CAST(sum(pc) AS DOUBLE) AS sy,
               CAST(sum(pc * pc) AS DOUBLE) AS syy,
               CAST(sum(c * pc) AS DOUBLE) AS sxy
        FROM p WHERE pc IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS lag1_autocorr
    FROM m
    """,
)
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — the
    seasonality/trend smoke test of a monitoring pipeline (near 0 ⇒
    day-to-day load is memoryless; near ±1 ⇒ trend or alternation).

    Operationalized as Pearson between the day series and its lag —
    all moments are exact BIGINT sums over integer counts (no decimal
    needed), the estimator is one fixed-order double expression. The
    raw stream collapses to one row per day BEFORE the ordered lag
    window, so the global sort touches day-count rows, not events.
    """
    e = t(spark, sf_dir, "events")
    d = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    p = d.select(
        "c", F.lag("c").over(Window.orderBy("day")).alias("pc")
    ).filter(F.col("pc").isNotNull())
    m = p.agg(
        (F.count(F.lit(1)) * F.lit(1.0)).alias("n"),
        F.sum("c").cast("double").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("sxx"),
        F.sum("pc").cast("double").alias("sy"),
        F.sum(F.col("pc") * F.col("pc")).cast("double").alias("syy"),
        F.sum(F.col("c") * F.col("pc")).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        n.cast("bigint").alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("lag1_autocorr"),
    )


N_PSI_BUCKETS = 10
PSI_BUCKET_WIDTH = 50_000  # o_totalprice spans ~1k..500k


@query(
    "etl_drift_psi",
    family="etl",
    oracle=f"""
    WITH tagged AS (
        SELECT least({N_PSI_BUCKETS - 1},
                     CAST(floor(o_totalprice / {PSI_BUCKET_WIDTH}) AS INT))
                   AS bucket,
               CASE WHEN year(o_orderdate) = 1995 THEN 'a' ELSE 'b' END AS side
        FROM orders
        WHERE year(o_orderdate) IN (1995, 2000)
    ),
    c AS (
        SELECT bucket,
               sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
        FROM tagged GROUP BY bucket
    ),
    spine AS (
        SELECT unnest(range({N_PSI_BUCKETS})) AS bucket
    ),
    f AS (
        SELECT s.bucket,
               coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb,
               sum(coalesce(ca, 0)) OVER () AS na,
               sum(coalesce(cb, 0)) OVER () AS nb
        FROM spine s LEFT JOIN c ON s.bucket = c.bucket
    ),
    terms AS (
        SELECT bucket,
               ((ca + 1) * 1.0 / (na + {N_PSI_BUCKETS})
                - (cb + 1) * 1.0 / (nb + {N_PSI_BUCKETS}))
               * ln(((ca + 1) * 1.0 / (na + {N_PSI_BUCKETS}))
                    / ((cb + 1) * 1.0 / (nb + {N_PSI_BUCKETS}))) AS term,
               na, nb
        FROM f
    )
    SELECT CAST(max(na) AS BIGINT) AS n_base,
           CAST(max(nb) AS BIGINT) AS n_current,
           round(list_sum(list(term ORDER BY bucket)), 6) AS psi
    FROM terms
    """,
)
def etl_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two order-year partitions —
    the standard distribution-drift monitor a production ETL runs on
    every refresh (PSI < 0.1 stable, > 0.25 action).

    Fixed-edge buckets (data-independent, so base and current are
    binned identically without a quantile pass), Laplace-smoothed
    shares so empty buckets stay finite, and the 10 PSI terms fold in
    explicit bucket order (ordered-fold identity, module docstring).
    Scale: one partial+final aggregate to 10 counters per side; the
    bucket spine is a literal range, so the whole comparison is a
    metadata-sized job regardless of partition size.
    """
    o = t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 2000)
    )
    tagged = o.select(
        F.least(
            F.lit(N_PSI_BUCKETS - 1),
            F.floor(F.col("o_totalprice") / PSI_BUCKET_WIDTH).cast("int"),
        ).alias("bucket"),
        F.when(F.year("o_orderdate") == 1995, "a").otherwise("b").alias("side"),
    )
    c = tagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("cb"),
    )
    spine = spark.range(N_PSI_BUCKETS).select(F.col("id").cast("int").alias("bucket"))
    f = (
        spine.join(F.broadcast(c), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .withColumn("na", F.sum("ca").over(Window.partitionBy()))
        .withColumn("nb", F.sum("cb").over(Window.partitionBy()))
    )
    pa = (F.col("ca") + 1) * F.lit(1.0) / (F.col("na") + N_PSI_BUCKETS)
    pb = (F.col("cb") + 1) * F.lit(1.0) / (F.col("nb") + N_PSI_BUCKETS)
    terms = f.select(
        "bucket", "na", "nb", ((pa - pb) * F.log(pa / pb)).alias("term")
    )
    return terms.agg(
        F.max("na").cast("bigint").alias("n_base"),
        F.max("nb").cast("bigint").alias("n_current"),
        F.round(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(bucket, term))),"
                " s -> s.term), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
            ),
            6,
        ).alias("psi"),
    )


N_EQUIDEPTH_BUCKETS = 8


@query(
    "agg_histogram_equidepth",
    family="aggregations",
    oracle=f"""
    WITH ranked AS (
        SELECT value,
               ntile({N_EQUIDEPTH_BUCKETS}) OVER (
                   ORDER BY value, event_id) AS bucket
        FROM events WHERE event_type = 'purchase'
    )
    SELECT bucket, count(*) AS n,
           CAST(min(value) AS DOUBLE) AS lo,
           CAST(max(value) AS DOUBLE) AS hi
    FROM ranked GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile buckets) of purchase values —
    agg_histogram's sibling: fixed-width buckets show shape but starve
    on skew (one bucket hoards the mass); equi-depth buckets each hold
    ~1/k of the rows, so the BOUNDARIES carry the distribution — the
    representation query optimizers and drift monitors actually store.
    The buckets match ``ntile`` over a TOTAL order (value, then the
    unique event_id) exactly, so both engines place identical rows in
    identical buckets; bounds are exact input values. Scale: a bare
    ntile window would be a single-partition WindowExec (all purchases
    through one task); instead ``ordered_prefix`` range-partitions on
    the order key and the ntile arithmetic maps each exact global rank
    to its bucket map-side (VERDICT r3 #2b) — the same parallel shape
    an approx_percentile-boundary histogram has, but exact.
    """
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    rk, n = ordered_prefix(
        e.select("value", "event_id"), ["value", "event_id"], rank_col="rnk"
    )
    ranked = rk.select(
        "value", _ntile_from_rank("rnk", n, N_EQUIDEPTH_BUCKETS).alias("bucket")
    )
    return ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
    )


@query(
    "agg_theil",
    family="aggregations",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DECIMAL(28,6)) AS DOUBLE) AS rev
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(rev AS DECIMAL(18,6)))
                    AS DECIMAL(28,6)) AS DOUBLE) AS total
        FROM per
    ),
    terms AS (
        SELECT per.o_custkey,
               (per.rev / (tot.total / tot.n))
                   * ln(per.rev / (tot.total / tot.n)) AS term,
               tot.n AS n
        FROM per CROSS JOIN tot
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           round(list_sum(list(term ORDER BY o_custkey)) / max(n), 6)
               AS theil_t
    FROM terms
    """,
)
def agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of per-customer revenue:
    T = (1/N) Σ (x/μ)·ln(x/μ) — the information-theoretic sibling of
    agg_gini (T decomposes additively across subgroups, which Gini
    cannot; together they complete the concentration toolkit).

    Determinism: x and μ derive from exact DECIMAL sums cast to
    double; each term is a fixed-operand-order expression (one
    division reused twice, a ln, a product), and the term sum folds in
    explicit o_custkey order on both engines (a plain sum(double)
    diverges in the low bits). Scale: one customer-keyed aggregate,
    one 1-row broadcast of (N, total), and the ordered fold — at
    cluster scale the fold's collect_list makes this a |customers|
    buffer, traded consciously for bit determinism (the scale path is
    a plain sum at 1e-9 tolerance).
    """
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(dsum(dec("o_totalprice")).alias("rev"))
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(dec("rev")).alias("total"),
    )
    mu = F.col("total") / F.col("n")
    term = (F.col("rev") / mu) * F.log(F.col("rev") / mu)
    terms = per.crossJoin(F.broadcast(tot)).select(
        "o_custkey", term.alias("term"), "n"
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(o_custkey, term))),"
        " s -> s.term), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.expr(fold) / F.max("n"), 6).alias("theil_t"),
    )


MAD_K = 1.4826  # normal-consistency constant
MAD_SIGMAS = 3.0


@query(
    "agg_outlier_mad",
    family="aggregations",
    oracle=f"""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, med.med,
               abs(e.value - med.med) AS adev
        FROM events e JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(dev.med), 6) AS med,
           round(max(mad.mad), 6) AS mad,
           CAST(sum(CASE WHEN dev.adev > {MAD_SIGMAS} * {MAD_K} * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    ORDER BY dev.event_type
    """,
)
def agg_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median absolute
    deviation with the 1.4826 normal-consistency constant, flagging
    |x − med| > 3σ̂ — the robust twin of win_zscore (mean/stddev break
    down exactly when the outliers you hunt are present; medians
    don't).

    Determinism: both engines interpolate exact medians on the same
    doubles (the agg_median contract), deviations are single-op
    doubles, and the threshold compare is one fixed expression on
    both sides — boundary cases resolve identically because the
    operands are bit-identical. Scale shape: two grouped exact
    medians + two broadcast-able joins of the per-type scalars back
    to the stream, ALL keyed on event_type (one exchange); at 100 TB
    swap the exact medians for approx_percentile(0.5) — the same
    documented trade as agg_median.
    """
    e = t(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    thresh = F.lit(MAD_SIGMAS) * F.lit(MAD_K) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(F.when(F.col("adev") > thresh, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --- round-5 additions: classical inference + robust-DQ operators ------

MW_GROUPS = ("click", "purchase")

# the final U/z chain as ONE shared SQL text over PRE-CAST double
# columns: both engines evaluate the identical expression over
# identical exact integers-as-doubles, so results match bit-for-bit
# (r1x2 = 2·R1 is an exact integer; u1 is a half-integer, exact in
# double). Every operand is cast to DOUBLE first — a bare 1.0 literal
# is DECIMAL in DuckDB and would drag the whole chain into decimal
# arithmetic there.
_MW_CAST_SQL = (
    "CAST(r1x2 AS DOUBLE) AS r1x2d, CAST(ties AS DOUBLE) AS tiesd,"
    " CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,"
    " CAST(n AS DOUBLE) AS nd"
)
_MW_U1_SQL = "r1x2d / 2 - n1d * (n1d + 1) / 2"
_MW_Z_SQL = (
    f"round((({_MW_U1_SQL}) - n1d * n2d / 2)"
    " / sqrt(n1d * n2d / 12"
    "        * ((nd + 1) - tiesd / (nd * (nd - 1)))), 6)"
)


@query(
    "agg_mann_whitney",
    family="stats",
    oracle=f"""
    WITH s AS (
        SELECT event_id, event_type AS grp, value FROM events
        WHERE event_type IN ('{MW_GROUPS[0]}', '{MW_GROUPS[1]}')
    ),
    r AS (
        SELECT grp, value,
               row_number() OVER (ORDER BY value, event_id) AS rk
        FROM s
    ),
    v AS (
        SELECT value, min(rk) AS lo, max(rk) AS hi, count(*) AS t,
               sum(CASE WHEN grp = '{MW_GROUPS[0]}' THEN 1 ELSE 0 END) AS n1v
        FROM r GROUP BY value
    ),
    a AS (
        SELECT CAST(sum(n1v * (lo + hi)) AS BIGINT) AS r1x2,
               CAST(sum(t * t * t - t) AS BIGINT) AS ties,
               CAST(sum(n1v) AS BIGINT) AS n1,
               CAST(sum(t) AS BIGINT) AS n
        FROM v
    )
    SELECT n1, n2, {_MW_U1_SQL} AS u1,
           n1d * n2d - ({_MW_U1_SQL}) AS u2, {_MW_Z_SQL} AS z
    FROM (SELECT n1, n - n1 AS n2, {_MW_CAST_SQL}
          FROM (SELECT r1x2, ties, n1, n, n - n1 AS n2 FROM a))
    """,
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test (rank-sum) between click and purchase event
    values — the distribution-free two-sample test next to
    agg_welch_t, with exact mid-rank tie handling and the tie-corrected
    normal approximation z.

    Scale design: global ranks come from ``ordered_prefix`` (range
    partition + per-partition offsets), NEVER a single-task global
    window; tied ranks are then averaged PER DISTINCT VALUE with one
    value-keyed aggregate — (min_rank + max_rank) per value gives
    2·midrank as an exact integer, so 2·R1 = Σ n1_v·(lo+hi) stays in
    BIGINT and every derived statistic is a fixed double chain over
    exact integers (shared SQL text with the oracle — bit-identical).
    The t³ tie term stays in int64 up to ~2M copies of one value;
    past that ANSI mode fails loudly rather than silently wrapping.
    """
    s = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*MW_GROUPS))
        .select("event_id", F.col("event_type").alias("grp"), "value")
    )
    rk, _n = ordered_prefix(s, ["value", "event_id"], rank_col="rk")
    v = rk.groupBy("value").agg(
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
        F.count(F.lit(1)).alias("t"),
        F.sum(F.when(F.col("grp") == MW_GROUPS[0], 1).otherwise(0)).alias("n1v"),
    )
    a = v.agg(
        F.sum(F.col("n1v") * (F.col("lo") + F.col("hi"))).cast("bigint").alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("ties"),
        F.sum("n1v").cast("bigint").alias("n1"),
        F.sum("t").cast("bigint").alias("n"),
    ).withColumn("n2", F.col("n") - F.col("n1"))
    cast = a.selectExpr("n1", "n2", *_MW_CAST_SQL.split(", "))
    return cast.select(
        "n1",
        "n2",
        F.expr(_MW_U1_SQL).alias("u1"),
        F.expr(f"n1d * n2d - ({_MW_U1_SQL})").alias("u2"),
        F.expr(_MW_Z_SQL).alias("z"),
    )


# one-way ANOVA over the 5 event types: conditional one-pass moments in
# fixed type order (the agg_entropy pattern) so the F chain is the
# identical expression text in both engines
_ANOVA_MOMENTS_SQL = ", ".join(
    f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i}, "
    f"CAST(sum(CASE WHEN event_type = '{et}' THEN CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS s{i}"
    for i, et in enumerate(EVENT_TYPES)
)
_ANOVA_SXX_SQL = (
    "CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))"
    " AS DECIMAL(38,12))"
)
_ANOVA_N_SQL = " + ".join(f"n{i}" for i in range(len(EVENT_TYPES)))
_ANOVA_S_SQL = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(len(EVENT_TYPES)))
_ANOVA_GROUPSQ_SQL = " + ".join(
    f"(CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / n{i})"
    for i in range(len(EVENT_TYPES))
)


@query(
    "agg_anova",
    family="stats",
    oracle=f"""
    WITH m AS (SELECT {_ANOVA_MOMENTS_SQL}, {_ANOVA_SXX_SQL} AS sxx FROM events),
    d AS (
        SELECT {_ANOVA_N_SQL} AS n, {_ANOVA_S_SQL} AS s,
               {_ANOVA_GROUPSQ_SQL} AS gsq, CAST(sxx AS DOUBLE) AS sxx
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n, {len(EVENT_TYPES)} AS k,
           round(gsq - s * s / n, 6) AS ss_between,
           round(sxx - gsq, 6) AS ss_within,
           round(((gsq - s * s / n) / {len(EVENT_TYPES) - 1})
                 / ((sxx - gsq) / (n - {len(EVENT_TYPES)})), 6) AS f_stat
    FROM d
    """,
)
def agg_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the five event types on event value —
    completes the hypothesis-testing family (welch_t: two means;
    chi2: categorical independence; ks: distribution equality;
    mann_whitney: rank shift; anova: k means at once).

    Numeric discipline: ONE conditional one-pass aggregate produces
    per-type counts and exact-DECIMAL sums plus the exact Σx²
    (DECIMAL(18,6)² stays inside int64 limbs in DuckDB at these
    magnitudes and precision 37 in Spark); the F statistic is then a
    fixed expression chain over those exact values in declared type
    order — identical text both engines, so 6-dp rounding is safe.
    Scale: one partial+final scan, a 1-row result, zero joins.
    """
    e = t(spark, sf_dir, "events")
    m = e.agg(
        *[
            c
            for i, et in enumerate(EVENT_TYPES)
            for c in (
                F.sum(F.when(F.col("event_type") == et, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n{i}"),
                F.sum(
                    F.when(F.col("event_type") == et, dec("value"))
                ).cast("decimal(28,6)").alias(f"s{i}"),
            )
        ],
        F.sum(dec("value") * dec("value")).cast("decimal(38,12)").alias("sxx"),
    )
    d = m.select(
        F.expr(_ANOVA_N_SQL).alias("n"),
        F.expr(_ANOVA_S_SQL).alias("s"),
        F.expr(_ANOVA_GROUPSQ_SQL).alias("gsq"),
        F.col("sxx").cast("double").alias("sxx"),
    )
    k = len(EVENT_TYPES)
    return d.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(k).alias("k"),
        F.expr("round(gsq - s * s / n, 6)").alias("ss_between"),
        F.expr("round(sxx - gsq, 6)").alias("ss_within"),
        F.expr(
            f"round(((gsq - s * s / n) / {k - 1})"
            f" / ((sxx - gsq) / (n - {k})), 6)"
        ).alias("f_stat"),
    )


# skewness/kurtosis are scale-invariant, so integer CENTS give exact
# raw moments. Per-term widths are STAGED so nothing overflows: x² fits
# int64 (x ≤ ~5e5 cents), x³ = DECIMAL(12)·DECIMAL(18) (30 digits),
# x⁴ = DECIMAL(18)·DECIMAL(18) (36 digits) — all ≤ 38-digit exact
# decimals on both engines; sums accumulate in DECIMAL(38)/HUGEINT.
_SK_X = "CAST(round(value * 100) AS BIGINT)"
# width split per engine (same exact values): Spark decimal products
# must keep p1+p2+1 ≤ 38, so terms stage at DECIMAL(18); DuckDB
# multiplies width-≤18 decimals in int64 (overflows) and needs ≥19 to
# take the hugeint path
_SK_X2 = f"CAST({_SK_X} * {_SK_X} AS DECIMAL(18,0))"
_SK_X3 = f"CAST(CAST({_SK_X} AS DECIMAL(12,0)) * {_SK_X2} AS DECIMAL(38,0))"
_SK_X4 = f"CAST({_SK_X2} * {_SK_X2} AS DECIMAL(38,0))"
_SK_X2_DUCK = f"CAST({_SK_X} * {_SK_X} AS DECIMAL(19,0))"
_SK_X3_DUCK = f"CAST(CAST({_SK_X} AS DECIMAL(19,0)) * {_SK_X2_DUCK} AS DECIMAL(38,0))"
_SK_X4_DUCK = f"CAST({_SK_X2_DUCK} * {_SK_X2_DUCK} AS DECIMAL(38,0))"
_SK_CHAIN = (
    "m2x", "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n"
)


@query(
    "agg_skew_kurtosis",
    family="stats",
    oracle=f"""
    WITH m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               sum(CAST({_SK_X} AS DECIMAL(38,0))) AS s1,
               sum(CAST({_SK_X2_DUCK} AS DECIMAL(38,0))) AS s2,
               sum({_SK_X3_DUCK}) AS s3,
               sum({_SK_X4_DUCK}) AS s4
        FROM events GROUP BY event_type
    ),
    c AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / n AS mu,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n)) / n AS m2,
               (CAST(s3 AS DOUBLE) - 3 * (CAST(s1 AS DOUBLE) / n) * CAST(s2 AS DOUBLE)
                + 2 * n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / n AS m3,
               (CAST(s4 AS DOUBLE) - 4 * (CAST(s1 AS DOUBLE) / n) * CAST(s3 AS DOUBLE)
                + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * CAST(s2 AS DOUBLE)
                - 3 * n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                  * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / n AS m4
        FROM m
    )
    SELECT event_type, n,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM c
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type skewness and excess kurtosis — the shape moments
    a drift monitor tracks beyond mean/variance. Built-in skewness()/
    kurtosis() differ cross-engine in bias convention AND accumulation
    order, so both engines compute the same closed form over EXACT
    integer-cents raw moments (standardized moments are scale-
    invariant; the cents rescale buys exactness for free, the
    agg_corr_matrix trick): x⁴ per-term stays inside int64, sums are
    DECIMAL(38)/HUGEINT, the central-moment chain is a shared fixed
    expression, and the only libm call is one correctly-rounded sqrt.
    Scale: one partial+final grouped scan, 5-row output.
    """
    x = F.expr(_SK_X)
    m = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            # staged per-term widths (see _SK_X2/_SK_X3/_SK_X4): the
            # raw long chain overflows at x⁴ once values pass ~3e4
            # cents, and Spark partial sums over long would overflow
            # far earlier — every term lands in DECIMAL(38,0) pre-sum
            F.sum(x.cast("decimal(38,0)")).alias("s1"),
            F.sum(F.expr(_SK_X2).cast("decimal(38,0)")).alias("s2"),
            F.sum(F.expr(_SK_X3)).alias("s3"),
            F.sum(F.expr(_SK_X4)).alias("s4"),
        )
    )
    mu = "(CAST(s1 AS DOUBLE) / n)"
    c = m.select(
        "event_type",
        "n",
        F.expr(
            f"(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * {mu}) / n"
        ).alias("m2"),
        F.expr(
            f"(CAST(s3 AS DOUBLE) - 3 * {mu} * CAST(s2 AS DOUBLE)"
            f" + 2 * n * {mu} * {mu} * {mu}) / n"
        ).alias("m3"),
        F.expr(
            f"(CAST(s4 AS DOUBLE) - 4 * {mu} * CAST(s3 AS DOUBLE)"
            f" + 6 * {mu} * {mu} * CAST(s2 AS DOUBLE)"
            f" - 3 * n * {mu} * {mu} * {mu} * {mu}) / n"
        ).alias("m4"),
    )
    return c.select(
        "event_type",
        "n",
        F.expr("round(m3 / (m2 * sqrt(m2)), 6)").alias("skewness"),
        F.expr("round(m4 / (m2 * m2) - 3.0, 6)").alias("excess_kurtosis"),
    )


IQR_K = 1.5  # Tukey fence multiplier


@query(
    "etl_outlier_iqr",
    family="stats",
    oracle=f"""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(max(q.q1), 6) AS q1, round(max(q.q3), 6) AS q3,
           round(max(q.q1) - {IQR_K} * (max(q.q3) - max(q.q1)), 6) AS lo_fence,
           round(max(q.q3) + {IQR_K} * (max(q.q3) - max(q.q1)), 6) AS hi_fence,
           CAST(sum(CASE WHEN e.value < q.q1 - {IQR_K} * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN e.value > q.q3 + {IQR_K} * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def etl_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier profile per event type — the
    quartile-based data-quality screen next to agg_outlier_mad's
    median/MAD one (IQR tolerates 25% contamination, MAD 50%; DQ
    suites ship both).

    Determinism: exact linear-interpolated quartiles — Spark
    percentile() and DuckDB quantile_cont() share the h = (n−1)·q
    interpolation on the same sorted doubles — and fences are one
    fixed multiply/add chain. Scale: the exact percentile is a
    per-group sort (SortAggregate); at 100 TB swap approx_percentile
    boundaries exactly as agg_outlier_mad documents, and the
    fence-count join is broadcast (5 rows) over one co-partitioned
    scan.
    """
    e = t(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    fenced = e.join(F.broadcast(q), "event_type")
    lo = F.col("q1") - F.lit(IQR_K) * iqr
    hi = F.col("q3") + F.lit(IQR_K) * iqr
    return fenced.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max("q1"), 6).alias("q1"),
        F.round(F.max("q3"), 6).alias("q3"),
        F.round(F.max("q1") - F.lit(IQR_K) * (F.max("q3") - F.max("q1")), 6).alias(
            "lo_fence"
        ),
        F.round(F.max("q3") + F.lit(IQR_K) * (F.max("q3") - F.max("q1")), 6).alias(
            "hi_fence"
        ),
        F.sum(F.when(F.col("value") < lo, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low"),
        F.sum(F.when(F.col("value") > hi, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high"),
    )


@query(
    "agg_weighted_median",
    family="stats",
    oracle="""
    WITH p AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT flag, price, w,
               sum(w) OVER (PARTITION BY flag ORDER BY price) AS cw,
               sum(w) OVER (PARTITION BY flag) AS wtot
        FROM p
    )
    SELECT flag, CAST(max(wtot) AS BIGINT) AS total_weight,
           min(CASE WHEN 2 * cw >= wtot THEN price END) AS weighted_median
    FROM c GROUP BY flag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative quantity reaches half the total — the
    inventory-weighted 'typical price' a plain median (one row, one
    vote) misrepresents.

    All-integer determinism: weights are integral quantities, the
    threshold test is 2·cumw ≥ total in exact BIGINTs (no halving, no
    floats), and the winning price is an input value, not an
    interpolation. Scale: prices pre-aggregate per (flag, price) —
    the window then runs over the DISTINCT-price grid co-partitioned
    by flag, and the flag-total window shares the same exchange.
    """
    li = t(spark, sf_dir, "lineitem")
    p = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    wc = Window.partitionBy("flag").orderBy("price")
    wt = Window.partitionBy("flag")
    c = p.select(
        "flag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("wtot"),
    )
    return c.groupBy("flag").agg(
        F.max("wtot").cast("bigint").alias("total_weight"),
        F.min(F.when(F.lit(2) * F.col("cw") >= F.col("wtot"), F.col("price"))).alias(
            "weighted_median"
        ),
    )


# Poisson(1) inverse-CDF thresholds as 6-hex-char strings (floor(CDF ·
# 16⁶), generated once and embedded in BOTH engines' expression text —
# lexicographic compare on fixed-width lowercase hex IS numeric
# compare, the llm_fim_transform portability trick). A row's replicate
# weight is the count of thresholds ≤ its md5 draw, i.e. the inverse
# CDF of a uniform in [0,1) at 16⁻⁶ resolution.
BOOT_B = 16  # bootstrap replicates
_BOOT_CDF_HEX = ("5e2d58", "bc5ab1", "eb715e", "fb2397", "ff1025", "ffd90f")


def _boot_weight_sql(b: int) -> str:
    h = f"substr(md5(CAST(event_id AS STRING) || ':b{b}'), 1, 6)"
    return (
        "(CASE "
        + " ".join(
            f"WHEN {h} < '{t}' THEN {k}"
            for k, t in enumerate(_BOOT_CDF_HEX)
        )
        + " ELSE 6 END)"
    )


@query(
    "agg_bootstrap_ci",
    family="stats",
    oracle=f"""
    WITH w AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c,
               {", ".join(f"{_boot_weight_sql(b).replace('AS STRING', 'AS VARCHAR')} AS w{b}" for b in range(BOOT_B))}
        FROM events
    ),
    reps AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               {", ".join(f"CAST(sum(w{b} * c) AS BIGINT) AS sc{b}, CAST(sum(w{b}) AS BIGINT) AS sw{b}" for b in range(BOOT_B))}
        FROM w
    ),
    m AS (
        SELECT n, s, unnest([{", ".join(f"CAST(sc{b} AS DOUBLE) / sw{b}" for b in range(BOOT_B))}]) AS mb
        FROM reps
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(CAST(max(s) AS DOUBLE) / max(n) / 100, 6) AS mean_value,
           round(quantile_cont(mb, 0.025) / 100, 6) AS ci_lo,
           round(quantile_cont(mb, 0.975) / 100, 6) AS ci_hi,
           {BOOT_B} AS n_replicates
    FROM m
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for the mean event
    value — THE resampling pattern that actually works distributed:
    classical bootstrap resamples n rows WITH replacement (a shuffle
    per replicate); Poisson bootstrap gives each row an independent
    Poisson(1) weight per replicate, so all B replicates come out of
    ONE streaming pass with map-side partial aggregation and nothing
    but 2·B counters crossing the shuffle.

    Determinism: weights derive from md5 hex draws against
    precomputed inverse-CDF thresholds (seedless, partitioning-
    independent, identical text both engines); replicate sums are
    exact BIGINTs over integer cents; each replicate mean is one
    division; the percentile over the B=16 replicate means
    interpolates identically on identical doubles. At 100 TB this is
    a single scan; the alternative (B shuffled resamples) is B full
    repartitions.
    """
    e = t(spark, sf_dir, "events")
    w = e.select(
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
        *[F.expr(_boot_weight_sql(b)).alias(f"w{b}") for b in range(BOOT_B)],
    )
    reps = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        *[
            col
            for b in range(BOOT_B)
            for col in (
                F.sum(F.col(f"w{b}") * F.col("c")).cast("bigint").alias(f"sc{b}"),
                F.sum(f"w{b}").cast("bigint").alias(f"sw{b}"),
            )
        ],
    )
    stacked = reps.selectExpr(
        "n",
        "s",
        "stack({}, {}) AS mb".format(
            BOOT_B,
            ", ".join(f"CAST(sc{b} AS DOUBLE) / sw{b}" for b in range(BOOT_B)),
        ),
    )
    return stacked.groupBy().agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(F.max("s").cast("double") / F.max("n") / 100, 6).alias(
            "mean_value"
        ),
        F.round(F.percentile("mb", F.lit(0.025)) / 100, 6).alias("ci_lo"),
        F.round(F.percentile("mb", F.lit(0.975)) / 100, 6).alias("ci_hi"),
        F.lit(BOOT_B).alias("n_replicates"),
    )


RFM_K = 4  # quartile scores per dimension


@query(
    "agg_rfm_segments",
    family="stats",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_date,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DECIMAL(28,6)) AS DOUBLE) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, monetary,
               ntile({RFM_K}) OVER (ORDER BY last_date, o_custkey) AS r,
               ntile({RFM_K}) OVER (ORDER BY n_orders, o_custkey) AS f,
               ntile({RFM_K}) OVER (ORDER BY monetary, o_custkey) AS m
        FROM cust
    )
    SELECT CAST(r AS INT) AS r_score, CAST(f AS INT) AS f_score,
           CAST(m AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(monetary AS DECIMAL(18,6))) / count(*), 6)
                AS DOUBLE) AS avg_monetary
    FROM scored
    GROUP BY r, f, m
    """,
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores on Recency (last
    order date), Frequency (order count) and Monetary (exact-decimal
    revenue), rolled up to the 4×4×4 segment grid with sizes and
    average spend — the canonical marketing-analytics cube
    ('champions' = 444, 'at risk' = 1x4).

    Scale shape: global quartiles WITHOUT a one-task window — each
    dimension takes one ``ordered_prefix`` pass (range-partitioned
    exact global ranks over the CUSTOMER-level table) and
    ``_ntile_from_rank`` turns ranks into SQL-standard ntile buckets
    map-side; total-order tiebreak (measure, custkey) makes both
    engines' tile assignment identical. Three customer-sized range
    shuffles + one 64-cell rollup; the fact table is scanned once.
    """
    cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_date"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum(dec("o_totalprice")).alias("monetary"),
        )
        .persist()
    )
    scored = cust.select("o_custkey", "monetary")
    for dim, order in (
        ("r", ["last_date", "o_custkey"]),
        ("f", ["n_orders", "o_custkey"]),
        ("m", ["monetary", "o_custkey"]),
    ):
        rk, n = ordered_prefix(
            cust.select("o_custkey", *order[:1]), order, rank_col="_rk"
        )
        tile = rk.select(
            "o_custkey", _ntile_from_rank("_rk", n, RFM_K).alias(dim)
        )
        scored = scored.join(tile, "o_custkey")
    return (
        scored.groupBy(
            F.col("r").alias("r_score"),
            F.col("f").alias("f_score"),
            F.col("m").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum(dec("monetary")) / F.count(F.lit(1)), 6)
            .cast("double")
            .alias("avg_monetary"),
        )
    )


JK_BUCKETS = 50


@query(
    "agg_jackknife_ratio",
    family="stats",
    oracle=f"""
    WITH b AS (
        SELECT user_id % {JK_BUCKETS} AS bucket,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS num,
               CAST(count(*) AS BIGINT) AS den
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(num) AS BIGINT) AS sn,
               CAST(sum(den) AS BIGINT) AS sd
        FROM b
    ),
    th AS (
        SELECT bucket, n, sn, sd,
               CAST(sn - num AS DOUBLE) / CAST(sd - den AS DOUBLE)
                   AS theta_i
        FROM b CROSS JOIN tot
    ),
    m AS (
        SELECT max(n) AS n, max(sn) AS sn, max(sd) AS sd,
               list_sum(list(theta_i ORDER BY bucket))
                   / CAST(max(n) AS DOUBLE) AS jk_mean
        FROM th
    ),
    v AS (
        SELECT max(m.n) AS n, max(m.sn) AS sn, max(m.sd) AS sd,
               max(m.jk_mean) AS jk_mean,
               list_sum(list((th.theta_i - m.jk_mean)
                             * (th.theta_i - m.jk_mean)
                             ORDER BY th.bucket)) AS ssq
        FROM th CROSS JOIN m
    )
    SELECT n AS n_buckets,
           round(CAST(sn AS DOUBLE) / CAST(sd AS DOUBLE), 6) AS ratio,
           round(jk_mean, 6) AS jk_mean,
           round(sqrt((CAST(n AS DOUBLE) - 1) / CAST(n AS DOUBLE) * ssq),
                 6) AS jk_se
    FROM v
    """,
)
def agg_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-bucket jackknife standard error of a RATIO metric
    (purchase cents per event) — the experimentation-platform
    confidence machinery for metrics that are quotients of sums (a
    plain per-row variance is WRONG for ratios: the denominator varies
    too). θ₍ᵢ₎ = (Sₙ−numᵢ)/(S_d−denᵢ) leave-one-out replicas over
    JK_BUCKETS user buckets; SE = √((n−1)/n · Σ(θ₍ᵢ₎−θ̄)²). Completes
    the resampling pair with agg_bootstrap_ci (bootstrap resamples;
    jackknife is closed-form from exact sums — no randomness at all).

    Determinism: bucket numerators/denominators and their totals are
    exact BIGINTs; each replica is one IEEE division of exact ints;
    the replica mean and squared-deviation sums fold in explicit
    bucket order on both engines (plain double sums diverge in low
    bits); sqrt is correctly rounded. Scale: one bucket-keyed
    aggregate over the corpus, then everything is JK_BUCKETS-sized —
    the ordered folds buffer 50 rows.
    """
    e = t(spark, sf_dir, "events")
    # persist: b feeds tot AND th, th feeds m AND dev — without it the
    # events-corpus bucket aggregate recomputes per consumer (the
    # documented intermediates-consumed-2-3x gotcha); unpersist is
    # deliberately left to context teardown (registry contract: query
    # fns return lazy DataFrames)
    b = e.groupBy((F.col("user_id") % JK_BUCKETS).alias("bucket")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("num"),
        F.count(F.lit(1)).cast("bigint").alias("den"),
    ).persist()
    tot = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("num").cast("bigint").alias("sn"),
        F.sum("den").cast("bigint").alias("sd"),
    )
    th = b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n",
        "sn",
        "sd",
        (
            (F.col("sn") - F.col("num")).cast("double")
            / (F.col("sd") - F.col("den")).cast("double")
        ).alias("theta_i"),
    ).persist()
    fold_theta = (
        "aggregate(transform(array_sort(collect_list(struct(bucket, theta_i))),"
        " s -> s.theta_i), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    m = th.agg(
        F.max("n").alias("n"),
        F.max("sn").alias("sn"),
        F.max("sd").alias("sd"),
        (F.expr(fold_theta) / F.max("n").cast("double")).alias("jk_mean"),
    )
    dev = th.crossJoin(F.broadcast(m.select("jk_mean"))).select(
        "bucket",
        (
            (F.col("theta_i") - F.col("jk_mean"))
            * (F.col("theta_i") - F.col("jk_mean"))
        ).alias("sq"),
    )
    fold_sq = (
        "aggregate(transform(array_sort(collect_list(struct(bucket, sq))),"
        " s -> s.sq), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    ssq = dev.agg(F.expr(fold_sq).alias("ssq"))
    return m.crossJoin(ssq).select(
        F.col("n").alias("n_buckets"),
        F.round(F.col("sn").cast("double") / F.col("sd").cast("double"), 6)
        .alias("ratio"),
        F.round("jk_mean", 6).alias("jk_mean"),
        F.round(
            F.sqrt(
                (F.col("n").cast("double") - 1)
                / F.col("n").cast("double")
                * F.col("ssq")
            ),
            6,
        ).alias("jk_se"),
    )


WINSOR_LO = 0.05
WINSOR_HI = 0.95


@query(
    "agg_winsorized_mean",
    family="stats",
    oracle=f"""
    WITH v AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(round(value * 100) AS BIGINT), event_id
               ) AS rk,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM events
    ),
    bounds AS (
        SELECT event_type, max(n) AS n,
               max(CASE WHEN rk = greatest(
                       1, CAST(ceil({WINSOR_LO} * n) AS BIGINT))
                   THEN cents END) AS lo,
               max(CASE WHEN rk = greatest(
                       1, CAST(floor({WINSOR_HI} * n) AS BIGINT))
                   THEN cents END) AS hi
        FROM v GROUP BY event_type
    )
    SELECT v.event_type,
           max(bounds.n) AS n_events,
           round(CAST(max(bounds.lo) AS DOUBLE) / 100, 6) AS lo_cut,
           round(CAST(max(bounds.hi) AS DOUBLE) / 100, 6) AS hi_cut,
           round(CAST(CAST(sum(least(greatest(v.cents, bounds.lo),
                                     bounds.hi)) AS BIGINT) AS DOUBLE)
                 / CAST(max(bounds.n) AS DOUBLE) / 100, 6)
               AS winsorized_mean
    FROM v JOIN bounds USING (event_type)
    GROUP BY v.event_type
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event value per type — clamp everything
    outside the [p05, p95] RANK cuts to the cut values, then average:
    the robust-location estimator that (unlike trimming or
    agg_outlier_mad's exclusion) keeps N constant, the standard guard
    for revenue metrics a few whale rows would otherwise own.

    Determinism: everything is exact integers — cents, rank-based
    (nearest-rank, not interpolated) percentile cuts with an event_id
    tiebreak so the rank permutation is total, a clamped BIGINT sum,
    and one final division. No interpolation, no double sums. Scale:
    one window pass + one group aggregate on the same event_type key
    (single exchange); the per-type rank window is the one sort, the
    same shape as win_topn_ties.
    """
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    v = (
        e.select("event_type", "event_id", cents.alias("cents"))
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n",
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .cast("bigint"),
        )
    )
    k_lo = F.greatest(F.lit(1), F.ceil(WINSOR_LO * F.col("n")).cast("bigint"))
    k_hi = F.greatest(F.lit(1), F.floor(WINSOR_HI * F.col("n")).cast("bigint"))
    bounds = v.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rk") == k_lo, F.col("cents"))).alias("lo"),
        F.max(F.when(F.col("rk") == k_hi, F.col("cents"))).alias("hi"),
    )
    joined = v.select("event_type", "cents").join(bounds, "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.round(F.max("lo").cast("double") / 100, 6).alias("lo_cut"),
            F.round(F.max("hi").cast("double") / 100, 6).alias("hi_cut"),
            F.round(
                F.sum(
                    F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
                )
                .cast("bigint")
                .cast("double")
                / F.max("n").cast("double")
                / 100,
                6,
            ).alias("winsorized_mean"),
        )
    )


CUPED_SPLIT = "2024-01-16"  # pre-period before, experiment period after


@query(
    "agg_cuped",
    family="stats",
    oracle=f"""
    WITH per AS (
        SELECT user_id,
               CAST(sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy
        FROM per
    ),
    cent AS (
        SELECT per.user_id,
               CAST(per.x AS DOUBLE) - CAST(tot.sx AS DOUBLE) / tot.n AS dx,
               CAST(per.y AS DOUBLE) - CAST(tot.sy AS DOUBLE) / tot.n AS dy,
               tot.n AS n
        FROM per CROSS JOIN tot
    ),
    s AS (
        SELECT max(n) AS n,
               list_sum(list(dx * dy ORDER BY user_id)) AS sxy,
               list_sum(list(dx * dx ORDER BY user_id)) AS sxx,
               list_sum(list(dy * dy ORDER BY user_id)) AS syy
        FROM cent
    )
    SELECT n AS n_users,
           round(sxy / sxx, 6) AS theta,
           round((sxy / sxx) * (sxy / syy), 6) + 0.0 AS var_reduction
    FROM s
    """,
)
def agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the third leg of
    the experimentation stool next to agg_jackknife_ratio (CI) and
    agg_bootstrap_ci: θ = cov(x, y)/var(x) regresses each user's
    experiment-period metric y on their PRE-period covariate x, and
    var_reduction = ρ² = θ·cov/var(y) is the fraction of metric
    variance the adjustment deletes (smaller experiments, same power).
    Periods split at CUPED_SPLIT over the event month.

    Determinism: per-user x/y are exact BIGINT cents; means are single
    divisions; the centered cross/self products fold in explicit
    user_id order on both engines (the agg_theil pattern — plain
    double sums diverge in low bits); `+ 0.0` normalizes −0.0. The
    n·Sxy integer-moment form was rejected: at corpus scale it needs
    DECIMAL staging whose widths legally differ per engine (the r5
    decimal-width-split gotcha). Scale: one user-keyed aggregate, one
    1-row broadcast, ordered folds buffer |users| — the conscious
    determinism trade documented in agg_theil.
    """
    e = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    split = F.lit(CUPED_SPLIT).cast("timestamp")
    # persist: per feeds tot AND cent, cent feeds 3 fold aggregates —
    # without it the events-corpus user aggregate recomputes per
    # consumer (the documented intermediates-consumed-2-3x gotcha);
    # unpersist is deliberately left to context teardown (registry
    # contract: query fns return lazy DataFrames)
    per = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= split, cents).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("y"),
    ).persist()
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    cent = per.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "n",
        (
            F.col("x").cast("double")
            - F.col("sx").cast("double") / F.col("n")
        ).alias("dx"),
        (
            F.col("y").cast("double")
            - F.col("sy").cast("double") / F.col("n")
        ).alias("dy"),
    ).persist()

    def fold(expr: str) -> F.Column:
        return F.expr(
            "aggregate(transform(array_sort(collect_list(struct(user_id,"
            f" {expr} AS v))), s -> s.v), CAST(0 AS DOUBLE), (a, v) -> a + v)"
        )

    s = cent.agg(
        F.max("n").alias("n"),
        fold("dx * dy").alias("sxy"),
        fold("dx * dx").alias("sxx"),
        fold("dy * dy").alias("syy"),
    )
    return s.select(
        F.col("n").alias("n_users"),
        F.round(F.col("sxy") / F.col("sxx"), 6).alias("theta"),
        (
            F.round(
                (F.col("sxy") / F.col("sxx")) * (F.col("sxy") / F.col("syy")),
                6,
            )
            + 0.0
        ).alias("var_reduction"),
    )


@query(
    "agg_mutual_information",
    family="stats",
    oracle="""
    WITH j AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY lang, source
    ),
    ml AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM j GROUP BY lang),
    ms AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM j GROUP BY source),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
    terms AS (
        SELECT j.lang, j.source,
               (CAST(j.c AS DOUBLE) / n.n)
                   * ln((CAST(j.c AS DOUBLE) * n.n)
                        / (CAST(ml.cl AS DOUBLE) * ms.cs)) AS term
        FROM j JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN n
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM j) AS n_cells,
           round(list_sum(list(term ORDER BY lang, source)), 6) + 0.0
               AS mutual_info
    FROM terms
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source —
    I(lang; source) = Σ p(l,s)·ln(p(l,s)/(p(l)p(s))): the dependence
    detector for corpus composition (MI ≈ 0 means sources draw from
    the same language mix; high MI means language is source-determined
    and a per-source sampler will skew the language balance).
    Completes the info-theoretic trio: agg_entropy (one marginal),
    llm_kl_shift (one conditional vs the marginal), MI (the joint).

    Determinism: all counts exact BIGINTs; each term is a fixed
    expression over exact-int products (c·n ≤ 5e8·5e8 at sf1 —
    computed in DOUBLE, exact below 2^53) and one ln (cross-engine
    precedent: agg_theil); the term sum folds in explicit (lang,
    source) order; `+ 0.0` normalizes −0.0. Scale: one (lang,
    source)-keyed aggregate over the corpus, then everything is
    contingency-table-sized.
    """
    d = t(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).persist()
    ml = j.groupBy("lang").agg(F.sum("c").cast("bigint").alias("cl"))
    ms = j.groupBy("source").agg(F.sum("c").cast("bigint").alias("cs"))
    n = j.agg(F.sum("c").cast("bigint").alias("n"))
    term = (F.col("c").cast("double") / F.col("n")) * F.log(
        (F.col("c").cast("double") * F.col("n"))
        / (F.col("cl").cast("double") * F.col("cs"))
    )
    terms = (
        j.join(ml, "lang")
        .join(ms, "source")
        .crossJoin(F.broadcast(n))
        .select("lang", "source", term.alias("term"))
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(lang, source,"
        " term))), s -> s.term), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (F.round(F.expr(fold), 6) + 0.0).alias("mutual_info"),
    )


@query(
    "agg_hhi",
    family="stats",
    oracle="""
    WITH per AS (
        SELECT n_name,
               s_suppkey,
               -- DECIMAL(19): DuckDB multiplies width<=18 decimals in
               -- int64 and OVERFLOWS on cents-squared; >=19 takes the
               -- hugeint path (the engines legally stage differently —
               -- the Spark side uses DECIMAL(18) products, see fn)
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS DECIMAL(19,0)) AS cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, s_suppkey
    ),
    agg AS (
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(cents) AS DECIMAL(38,0)) AS tot,
               CAST(sum(cents * cents) AS DECIMAL(38,0)) AS sumsq
        FROM per GROUP BY n_name
    )
    SELECT n_name, n_suppliers,
           round(CAST(sumsq AS DOUBLE)
                 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi
    FROM agg
    """,
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each nation: HHI = Σ shareᵢ² = Σ centsᵢ² / (Σ centsᵢ)² —
    the antitrust-grade market-concentration number next to agg_gini
    (inequality of a distribution) and agg_lorenz (the whole curve);
    HHI is the one regulators threshold (0.15/0.25).

    Determinism: per-supplier revenue is exact integer cents; squares
    and sums stay in exact DECIMAL; the final expression is two
    divisions of exactly-represented values. The decimal STAGING
    differs per engine BY NECESSITY (the r5 width-split gotcha):
    DuckDB squares DECIMAL(19,0) so the multiply takes the hugeint
    path (width ≤ 18 overflows int64), while Spark squares
    DECIMAL(18,0) because its product rule p1+p2+1 must stay ≤ 38 —
    same exact values, different legal routes. Scale: one
    supplier-keyed aggregate + one nation-keyed aggregate, single
    exchange each.
    """
    li = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("decimal(18,0)")
            .alias("cents")
        )
    )
    agg = per.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("decimal(38,0)").alias("tot"),
        F.sum(F.col("cents") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sumsq"),
    )
    return agg.select(
        "n_name",
        "n_suppliers",
        F.round(
            F.col("sumsq").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("hhi"),
    )


ACF_MAX_LAG = 7


@query(
    "win_acf",
    family="windows",
    oracle=f"""
    WITH d AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                    CAST(ts AS DATE)) AS BIGINT) AS di,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sx,
               CAST(sum(c * c) AS BIGINT) AS sxx
        FROM d
    ),
    lags AS (
        SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag
    ),
    cross_terms AS (
        SELECT lags.lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(a.c * b.c) AS BIGINT) AS sxy
        FROM lags
        JOIN d a ON TRUE
        JOIN d b ON b.di = a.di + lags.lag
        GROUP BY lags.lag
    )
    SELECT ct.lag, ct.n_pairs,
           round((CAST(ct.sxy AS DOUBLE) - CAST(ct.n_pairs AS DOUBLE)
                      * (CAST(m.sx AS DOUBLE) / m.n)
                      * (CAST(m.sx AS DOUBLE) / m.n))
                 / (CAST(m.sxx AS DOUBLE)
                    - CAST(m.n AS DOUBLE)
                      * (CAST(m.sx AS DOUBLE) / m.n)
                      * (CAST(m.sx AS DOUBLE) / m.n)), 6) + 0.0 AS acf
    FROM cross_terms ct CROSS JOIN m
    ORDER BY ct.lag
    """,
)
def win_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event counts at lags 1–7 —
    the full weekly-rhythm profile agg_autocorr's single lag-1 point
    cannot see (a lag-7 spike IS weekly seasonality; the ACF table is
    what win_seasonal_decompose's period choice should be read
    against). Standard stationary estimator: ρ(k) = (Σ cᵢcᵢ₊ₖ −
    nₖ·x̄²) / Σ(cᵢ − x̄)², global mean/variance in the denominator.

    Determinism: counts and all moments are exact BIGINTs (c·c well
    inside int64); x̄ is one division; each lag's estimate is a fixed
    double expression — no double sums anywhere. Scale: the stream
    collapses to one row per day FIRST; the lag joins are day-grid ×
    7 (the calendar-bounded class); the moment row broadcasts.
    """
    e = t(spark, sf_dir, "events")
    d = (
        e.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("di")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sxx"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = d.select(F.col("di").alias("ai"), F.col("c").alias("ac"))
    b = d.select(F.col("di").alias("bi"), F.col("c").alias("bc"))
    ct = (
        lags.crossJoin(a)
        .join(b, F.col("bi") == F.col("ai") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("ac") * F.col("bc")).cast("bigint").alias("sxy"),
        )
    )
    mean = F.col("sx").cast("double") / F.col("n")
    acf = (
        F.col("sxy").cast("double")
        - F.col("n_pairs").cast("double") * mean * mean
    ) / (
        F.col("sxx").cast("double") - F.col("n").cast("double") * mean * mean
    )
    return (
        ct.crossJoin(F.broadcast(m))
        .select("lag", "n_pairs", (F.round(acf, 6) + 0.0).alias("acf"))
    )


FDR_Q10 = 10  # BH level q = 1/FDR_Q10 = 0.10, kept as an exact integer


@query(
    "agg_fdr_bh",
    family="stats",
    oracle=f"""
    WITH mon AS (
        SELECT event_type, CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    steps AS (
        SELECT event_type, cents,
               lag(cents) OVER (PARTITION BY event_type ORDER BY m) AS prev
        FROM mon
    ),
    per AS (
        SELECT event_type,
               CAST(count(prev) AS BIGINT) AS n_cmp,
               CAST(sum(CASE WHEN cents > prev THEN 1 ELSE 0 END)
                    AS BIGINT) AS k_up
        FROM steps GROUP BY event_type
    ),
    pv AS (
        SELECT event_type, n_cmp, k_up,
               list_reduce(
                   list_prepend(
                       [CAST(1 AS DOUBLE),
                        CAST(CASE WHEN n_cmp >= abs(2 * k_up - n_cmp)
                                  THEN 1 ELSE 0 END AS DOUBLE)],
                       list_transform(range(1, CAST(n_cmp AS INT) + 1),
                                      j -> [CAST(j AS DOUBLE),
                                            CAST(0 AS DOUBLE)])),
                   (a, e) -> [
                       a[1] * (CAST(n_cmp AS DOUBLE) - e[1] + 1) / e[1],
                       a[2] + CASE WHEN abs(2 * e[1] - n_cmp)
                                        >= abs(2 * k_up - n_cmp)
                                   THEN a[1] * (CAST(n_cmp AS DOUBLE)
                                                - e[1] + 1) / e[1]
                                   ELSE 0 END
                   ])[2]
               / pow(CAST(2 AS DOUBLE), n_cmp)
                   AS p
        FROM per
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY p, event_type) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS m_tests
        FROM pv
    ),
    cut AS (
        SELECT max(CASE WHEN p * m_tests * {FDR_Q10} <= rk
                        THEN rk ELSE 0 END) AS r
        FROM ranked
    )
    SELECT event_type, n_cmp, k_up,
           round(p, 6) + 0.0 AS p_value,
           CAST(rk AS BIGINT) AS bh_rank,
           (rk <= (SELECT r FROM cut)) AS rejected
    FROM ranked
    """,
)
def agg_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over per-event_type sign tests —
    the multiple-testing guard every experimentation platform runs on
    top of its per-metric tests (agg_welch_t/agg_cuped report ONE
    hypothesis; ship m of them and 5% of nulls reject by chance).
    Hypothesis family: per event_type, a two-sided SIGN TEST on
    month-over-month revenue direction (k_up of n_cmp steps up; under
    H₀ each step is a fair coin). BH at q=0.10: rank p ascending,
    reject ranks ≤ the largest r with p_(r) ≤ r·q/m.

    Determinism (libm-free by construction — the win_pettitt policy):
    the binomial tail is an ORDERED fold, c_j = c_{j-1}·(n−j+1)/j —
    every intermediate is an exact small integer in doubles (n ≤ 11 ⇒
    C(n,j) ≤ 462) — summing exactly the terms with |2j−n| ≥ |2k−n|;
    p is a dyadic rational with denominator 2^n ≤ 2048, exact in
    binary, so the BH compare p·m·10 ≤ r is integer-exact. DuckDB's
    list_reduce takes init from the first element, so the fold state
    rides a 3-list [j, C(n,j), tail_sum] (the win_holt_winters
    encoding); Spark's aggregate uses a struct accumulator with the
    identical op order. Ties in the BH rank break on event_type.

    Scale: one (event_type, month)-keyed exact-cents aggregate, then
    everything is m-sized (one row per hypothesis); the BH rank/cut is
    a 1-row broadcast over the m-row table.
    """
    e = t(spark, sf_dir, "events")
    mon = e.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("m")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("m")
    steps = mon.select(
        "event_type", "cents", F.lag("cents").over(w).alias("prev")
    )
    per = steps.groupBy("event_type").agg(
        F.count("prev").cast("bigint").alias("n_cmp"),
        F.sum(
            F.when(F.col("cents") > F.col("prev"), 1).otherwise(0)
        ).cast("bigint").alias("k_up"),
    )
    # ordered binomial fold: (c = C(n, j), tail = Σ qualifying C(n, j));
    # n_cmp = 0 (single-month series) guards OUT of the fold entirely —
    # Spark sequence(1, 0) is DESCENDING (the documented gotcha) and
    # its j = 0 element would divide by zero
    fold = (
        "IF(n_cmp = 0, CAST(1 AS DOUBLE), "
        "aggregate(sequence(1, CAST(n_cmp AS INT)), "
        "named_struct('c', CAST(1 AS DOUBLE), "
        " 'tail', CAST(IF(n_cmp >= abs(2 * k_up - n_cmp), 1, 0) AS DOUBLE)), "
        "(a, j) -> named_struct("
        " 'c', a.c * (CAST(n_cmp AS DOUBLE) - j + 1) / j, "
        " 'tail', a.tail + IF(abs(2 * j - n_cmp) >= abs(2 * k_up - n_cmp), "
        "   a.c * (CAST(n_cmp AS DOUBLE) - j + 1) / j, CAST(0 AS DOUBLE))), "
        "s -> s.tail))"
    )
    pv = per.select(
        "event_type",
        "n_cmp",
        "k_up",
        (
            # power(2, n) instead of shiftleft(1L, n): the shift
            # overflows to a negative denominator at n_cmp >= 63
            # (ADVICE r7); 2^n is exactly representable in doubles up
            # to n = 1023, far past any calendar series length.
            F.expr(fold)
            / F.expr("power(CAST(2 AS DOUBLE), CAST(n_cmp AS DOUBLE))")
        ).alias("p"),
    )
    wr = Window.orderBy("p", "event_type")
    ranked = pv.select(
        "*", F.row_number().over(wr).alias("rk")
    ).persist()  # consumed by m-count, the cut aggregate AND the output
    m1 = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("m_tests"))
    with_m = ranked.crossJoin(F.broadcast(m1))
    cut = with_m.agg(
        F.max(
            F.when(
                F.col("p") * F.col("m_tests") * FDR_Q10 <= F.col("rk"),
                F.col("rk"),
            ).otherwise(0)
        ).alias("r")
    )
    return with_m.crossJoin(F.broadcast(cut)).select(
        "event_type",
        "n_cmp",
        "k_up",
        (F.round("p", 6) + 0.0).alias("p_value"),
        F.col("rk").cast("bigint").alias("bh_rank"),
        (F.col("rk") <= F.col("r")).alias("rejected"),
    )


@query(
    "agg_qte",
    family="stats",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'a' ELSE 'b' END AS grp,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY event_type,
                       CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 1) < '8'
                            THEN 'a' ELSE 'b' END
                   ORDER BY CAST(round(value * 100) AS BIGINT), event_id
               ) AS rk,
               CAST(count(*) OVER (
                   PARTITION BY event_type,
                       CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 1) < '8'
                            THEN 'a' ELSE 'b' END
               ) AS BIGINT) AS n
        FROM events
    ),
    cut AS (
        SELECT event_type,
               max(CASE WHEN grp = 'a' THEN n END) AS n_a,
               max(CASE WHEN grp = 'b' THEN n END) AS n_b,
               max(CASE WHEN grp = 'a' AND rk = greatest(
                   1, CAST(ceil(0.25 * n) AS BIGINT)) THEN cents END) AS a25,
               max(CASE WHEN grp = 'a' AND rk = greatest(
                   1, CAST(ceil(0.5 * n) AS BIGINT)) THEN cents END) AS a50,
               max(CASE WHEN grp = 'a' AND rk = greatest(
                   1, CAST(ceil(0.75 * n) AS BIGINT)) THEN cents END) AS a75,
               max(CASE WHEN grp = 'b' AND rk = greatest(
                   1, CAST(ceil(0.25 * n) AS BIGINT)) THEN cents END) AS b25,
               max(CASE WHEN grp = 'b' AND rk = greatest(
                   1, CAST(ceil(0.5 * n) AS BIGINT)) THEN cents END) AS b50,
               max(CASE WHEN grp = 'b' AND rk = greatest(
                   1, CAST(ceil(0.75 * n) AS BIGINT)) THEN cents END) AS b75
        FROM v GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           round(CAST(b25 - a25 AS DOUBLE) / 100, 6) + 0.0 AS qte_25,
           round(CAST(b50 - a50 AS DOUBLE) / 100, 6) + 0.0 AS qte_50,
           round(CAST(b75 - a75 AS DOUBLE) / 100, 6) + 0.0 AS qte_75
    FROM cut
    """,
)
def agg_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects per event_type — the distributional
    A/B readout the mean-based tests miss (agg_welch_t/agg_cuped see
    only the average; a treatment that moves the tails but not the
    median, or vice versa, shows up HERE): QTE(q) = Q_B(q) − Q_A(q) at
    q ∈ {25, 50, 75}, with users deterministically split into A/B by
    md5 hex parity (the llm_dataset_split assignment pattern — both
    engines hash the same text to the same lowercase hex).

    Determinism: quantiles are exact RANK CUTS over exact integer
    cents with a total-order tiebreak (cents, event_id) — the
    agg_winsorized_mean machinery, never an interpolated percentile
    whose arithmetic could differ per engine; the three fractions are
    dyadic (0.25/0.5/0.75), so q·n is an exact double and ceil is
    exact. Effects divide integer cent differences by 100 once.

    Scale: one range shuffle per (event_type, group) partition for the
    rank (the window's sort IS the quantile computation), then a
    6-cell conditional aggregate per event_type. Group sizes stay
    balanced by construction (hash parity), so no skewed partition.
    """
    e = t(spark, sf_dir, "events")
    grp = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "a"
    ).otherwise("b")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("event_type", "grp").orderBy("cents", "event_id")
    v = (
        e.select(
            "event_type", grp.alias("grp"), cents.alias("cents"), "event_id"
        )
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n",
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type", "grp"))
            .cast("bigint"),
        )
    )

    def cut(g: str, q: float, name: str) -> F.Column:
        k = F.greatest(F.lit(1), F.ceil(q * F.col("n")).cast("bigint"))
        return F.max(
            F.when((F.col("grp") == g) & (F.col("rk") == k), F.col("cents"))
        ).alias(name)

    agg = v.groupBy("event_type").agg(
        F.max(F.when(F.col("grp") == "a", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == "b", F.col("n"))).alias("n_b"),
        cut("a", 0.25, "a25"),
        cut("a", 0.5, "a50"),
        cut("a", 0.75, "a75"),
        cut("b", 0.25, "b25"),
        cut("b", 0.5, "b50"),
        cut("b", 0.75, "b75"),
    )

    def eff(b: str, a: str, name: str) -> F.Column:
        return (
            F.round((F.col(b) - F.col(a)).cast("double") / 100, 6) + 0.0
        ).alias(name)

    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        eff("b25", "a25", "qte_25"),
        eff("b50", "a50", "qte_50"),
        eff("b75", "a75", "qte_75"),
    )


N_PERMS = 200  # permutation draws; p-value resolution 1/(N+1)

# Per-(unit, permutation) fair coin WITHOUT a per-pair hash: two md5
# digests per unit (256 independent bits ≥ N_PERMS), computed BEFORE
# the ×K explode; permutation k reads bit (k−1) of the concatenated
# hex — one substring + one 4-bit hex parse per exploded row instead
# of a full md5 (the first draft hashed per (unit, k): 12M md5s,
# 9.5 s at sf0.1 — this form is ~6× faster). Cross-engine: Spark
# conv(hex, 16, 10) ≡ DuckDB CAST('0x' || hex AS BIGINT), and both
# shift-mask identically.
_PERM_SIDE_SPARK = (
    "pmod(CAST(conv(substring(IF(k <= 128, h0, h1),"
    " CAST((pmod(k - 1, 128)) DIV 4 AS INT) + 1, 1), 16, 10) AS BIGINT)"
    " DIV shiftleft(CAST(1 AS BIGINT), CAST(pmod(k - 1, 4) AS INT)), 2)"
)
_PERM_SIDE_DUCK = (
    "(CAST(('0x' || substring(CASE WHEN k <= 128 THEN h0 ELSE h1 END,"
    " CAST(((k - 1) % 128) // 4 AS INT) + 1, 1)) AS BIGINT)"
    " // (CAST(1 AS BIGINT) << CAST((k - 1) % 4 AS INT))) % 2"
)

# r13 optimization (guide §2.3 narrower types / §1.2 per-task work):
# the ENGINE extracts permutation bits from eight 32-bit words parsed
# once per unit (8 conv calls pre-explode) instead of one
# substring+conv per exploded row (200 string parses per unit, 12M at
# sf0.1) — measured 3.4× on the null-distribution stage with an
# IDENTICAL per-k aggregate (tests/test_stats.py pins bit-for-bit
# equality of the two forms over every k). The ORACLE keeps the
# readable per-nibble text — both read the same bit: hex char
# c = (k−1)%128 DIV 4 of the digest sits in word c DIV 8 at
# big-endian offset c%8, so bit j = (k−1)%4 of that nibble is word
# bit 4·(7 − c%8) + j.
_PERM_WORD_COLS = [
    f"CAST(conv(substring({h}, {1 + 8 * t}, 8), 16, 10) AS BIGINT) AS w{4 * i + t}"
    for i, h in enumerate(("h0", "h1"))
    for t in range(4)
]
_PERM_SIDE_WORDS = (
    "pmod(shiftright(CASE CAST(pmod(k - 1, 128) DIV 32 AS INT)"
    " + IF(k <= 128, 0, 4) "
    + "".join(f"WHEN {w} THEN w{w} " for w in range(8))
    + "END, CAST(4 * (7 - pmod(pmod(k - 1, 128) DIV 4, 8))"
    " + pmod(k - 1, 4) AS INT)), 2)"
)


@query(
    "agg_permutation_test",
    family="stats",
    oracle=f"""
    WITH u AS (
        SELECT o_orderkey,
               CAST(o_orderpriority = '1-URGENT' AS INT) AS in_a,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               md5(CAST(o_orderkey AS VARCHAR) || ':0') AS h0,
               md5(CAST(o_orderkey AS VARCHAR) || ':1') AS h1
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    obs AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(count(*) - sum(in_a) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN in_a = 1 THEN cents END) AS DOUBLE)
                   / sum(in_a)
                 - CAST(sum(CASE WHEN in_a = 0 THEN cents END) AS DOUBLE)
                   / (count(*) - sum(in_a)) AS d
        FROM u
    ),
    perm AS (
        SELECT g.k,
               CAST(sum(CASE WHEN {_PERM_SIDE_DUCK} = 0 THEN cents END)
                    AS DOUBLE)
                 / sum(CASE WHEN {_PERM_SIDE_DUCK} = 0 THEN 1 ELSE 0 END)
               - CAST(sum(CASE WHEN {_PERM_SIDE_DUCK} = 1 THEN cents END)
                      AS DOUBLE)
                 / sum(CASE WHEN {_PERM_SIDE_DUCK} = 1 THEN 1 ELSE 0 END)
                 AS d
        FROM u, generate_series(1, {N_PERMS}) AS g(k)
        GROUP BY g.k
    )
    SELECT obs.n_a, obs.n_b,
           round(abs(obs.d) / 100, 6) + 0.0 AS obs_diff,
           CAST({N_PERMS} AS BIGINT) AS k_perms,
           round(CAST(1 + (SELECT count(*) FROM perm
                           WHERE abs(perm.d) >= abs(obs.d)) AS DOUBLE)
                 / CAST({N_PERMS} + 1 AS DOUBLE), 6) + 0.0 AS p_value
    FROM obs
    """,
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample PERMUTATION test on mean order value, URGENT vs LOW
    priority — the exact nonparametric twin of agg_welch_t: no
    normality or variance assumption, the null distribution is built
    by re-splitting the pooled orders. Deterministic permutations (no
    rand() — retry-idempotent and oracle-replayable): permutation k's
    side for each order is BIT k−1 of two per-order md5 digests (256
    independent fair bits ≥ K, hashed once per order BEFORE the ×K
    explode — see _PERM_SIDE_SPARK for the per-(unit,k)-hash
    postmortem), so both engines generate the IDENTICAL {N_PERMS}
    pseudo-permutations. p = (1 + #{{|d_k| ≥ |d_obs|}}) / (K + 1), the
    add-one estimator that never reports 0.

    Determinism: sums are exact BIGINT cents; each mean is one IEEE
    division; d = one subtraction — identical chains both engines, so
    the ≥ comparison is boundary-exact. (Binomial-split permutations
    rather than label-shuffles: each unit flips a fair md5 coin, which
    keeps the draw embarrassingly parallel — a true shuffle needs a
    global permutation, the documented trade.)

    Scale: the ×K explode amplifies map output, but groupBy(k)
    partial-aggregates per task BEFORE the shuffle — only K×(sums)
    rows cross the wire regardless of corpus size; the whole null
    distribution is K rows.
    """
    e = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        "o_orderkey",
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("in_a"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":0"))).alias("h0"),
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":1"))).alias("h1"),
    )
    obs = e.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("in_a")).cast("bigint").alias("n_b"),
        (
            F.sum(F.when(F.col("in_a") == 1, F.col("cents"))).cast("double")
            / F.sum("in_a")
            - F.sum(F.when(F.col("in_a") == 0, F.col("cents"))).cast("double")
            / (F.count(F.lit(1)) - F.sum("in_a"))
        ).alias("d"),
    )
    perm = (
        e.selectExpr("cents", *_PERM_WORD_COLS)
        .select(
            "cents",
            *[f"w{i}" for i in range(8)],
            F.explode(F.sequence(F.lit(1), F.lit(N_PERMS))).alias("k"),
        )
        .select("cents", "k", F.expr(_PERM_SIDE_WORDS).alias("side"))
        .groupBy("k")
        .agg(
            (
                F.sum(F.when(F.col("side") == 0, F.col("cents"))).cast(
                    "double"
                )
                / F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
                - F.sum(F.when(F.col("side") == 1, F.col("cents"))).cast(
                    "double"
                )
                / F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
            ).alias("d")
        )
    )
    # count of permuted |d| >= observed |d| via a 1-row broadcast of obs
    cnt = (
        perm.crossJoin(F.broadcast(obs.select(F.col("d").alias("d_obs"))))
        .filter(F.abs(F.col("d")) >= F.abs(F.col("d_obs")))
        .agg(F.count(F.lit(1)).alias("n_ge"))
    )
    return obs.crossJoin(F.broadcast(cnt)).select(
        "n_a",
        "n_b",
        (F.round(F.abs(F.col("d")) / 100, 6) + 0.0).alias("obs_diff"),
        F.lit(N_PERMS).cast("bigint").alias("k_perms"),
        (
            F.round(
                (F.lit(1) + F.col("n_ge")).cast("double") / (N_PERMS + 1), 6
            )
            + 0.0
        ).alias("p_value"),
    )


@query(
    "agg_hodges_lehmann",
    family="stats",
    oracle="""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, a.cents + b.cents AS s2
        FROM day a JOIN day b
          ON a.event_type = b.event_type AND a.d <= b.d
    )
    SELECT event_type,
           (SELECT CAST(count(*) AS BIGINT) FROM day dd
            WHERE dd.event_type = pairs.event_type) AS n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(median(s2) AS DOUBLE) / 200, 6) + 0.0 AS hl_estimate
    FROM pairs GROUP BY event_type
    """,
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location estimator of daily revenue per
    event_type: the median of all pairwise (Walsh) averages
    (yᵢ+yⱼ)/2, i ≤ j — the estimator behind the Wilcoxon signed-rank
    test, with 29% efficiency loss at the Gaussian but a 0.29
    breakdown point: the robust-statistics step between the mean
    (agg_stats) and the plain median (agg_median), and the natural
    companion to agg_outlier_mad / agg_winsorized_mean in the robust
    family.

    Determinism: Walsh sums are exact BIGINT cents (yᵢ+yⱼ kept as
    cents×2 — never divided before the median); Spark's exact
    ``percentile(0.5)`` ≡ DuckDB ``median`` on integers (both average
    the two middle values on even counts — the win_rolling_median
    probe); the single /200 (cents×2 → dollars) is one IEEE division.

    Scale: the pair join is per-event_type over the CALENDAR-BOUNDED
    day grid — n_days² pairs per type regardless of corpus size (the
    win_mann_kendall class), never a row-level self-join; at 100 TB
    the day aggregate is the only corpus-sized stage.
    """
    e = t(spark, sf_dir, "events")
    day = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a, b = day.alias("a"), day.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") <= F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.cents") + F.col("b.cents")).alias("s2"),
    )
    nd = day.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    agg = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("percentile(s2, 0.5)").alias("med"),
    )
    return agg.join(nd, "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        (F.round(F.col("med").cast("double") / 200, 6) + 0.0).alias(
            "hl_estimate"
        ),
    )


SRM_CHI2_ALARM = 10.828  # chi-square_1 critical value at alpha = 0.001

# Normal quantiles for the power calculation, embedded as shared
# literals (erf/ppf are libm territory — the IDCG_AT_K policy):
Z_ALPHA_975 = 1.959963984540054  # two-sided alpha = 0.05
Z_POWER_80 = 0.8416212335729143  # power = 0.80


@query(
    "agg_srm_check",
    family="stats",
    oracle=f"""
    WITH g AS (
        SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS in_a
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    c AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(count(*) - sum(in_a) AS BIGINT) AS n_b
        FROM g
    )
    SELECT n_a, n_b,
           round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                 / (n_a + n_b), 6) + 0.0 AS chi2_stat,
           (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
              > {SRM_CHI2_ALARM}) AS srm_detected
    FROM c
    """,
)
def agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the FIRST check every
    experimentation platform runs before reading any metric: if the
    md5-parity 50/50 user split (the agg_qte/llm_dataset_split
    assignment) lands materially off 50/50, the assignment pipeline is
    broken and every downstream readout is invalid. One-degree
    chi-square against the expected equal split:
    χ² = (n_a − n_b)²/(n_a + n_b), alarmed at the conventional
    α = 0.001 critical value {SRM_CHI2_ALARM} (a LITERAL — the p-value
    needs no libm incomplete-gamma, the threshold compare is the
    production semantics).

    Determinism: unit = distinct user_id; counts are exact BIGINT; the
    statistic is one integer square divided once into a double; the
    alarm compare is on that bit-exact value.

    Scale: one distinct-shuffle on user_id, then a 1-row aggregate —
    the check is free at any corpus size.
    """
    g = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            (
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                < "8"
            )
            .cast("int")
            .alias("in_a")
        )
    )
    c = g.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("in_a")).cast("bigint").alias("n_b"),
    )
    stat = (
        ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b")))
        .cast("double")
        / (F.col("n_a") + F.col("n_b"))
    )
    return c.select(
        "n_a",
        "n_b",
        (F.round(stat, 6) + 0.0).alias("chi2_stat"),
        (stat > SRM_CHI2_ALARM).alias("srm_detected"),
    )


@query(
    "agg_power_mde",
    family="stats",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS grp,
             count(*) AS n,
             CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                * CAST(0.001 AS DECIMAL(9,3))
                                AS DECIMAL(18,6))) AS DECIMAL(28,6))
                  AS DOUBLE) AS sfx_k,
             CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                * CAST(0.001 AS DECIMAL(9,3))
                                AS DECIMAL(18,6))
                           * CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                  * CAST(0.001 AS DECIMAL(9,3))
                                  AS DECIMAL(18,6)))
                  AS DECIMAL(28,6)) AS DOUBLE) AS sxx_k
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority
    ),
    s AS (
      SELECT grp, n,
             ((sxx_k - sfx_k * sfx_k / n) / (n - 1)) * 1000000.0 AS var
      FROM m
    )
    SELECT a.n AS n_urgent, b.n AS n_low,
           round(({Z_ALPHA_975} + {Z_POWER_80})
                 * sqrt(a.var / a.n + b.var / b.n), 6) + 0.0 AS mde,
           round(CAST(2 AS DOUBLE) * ({Z_ALPHA_975} + {Z_POWER_80})
                 * ({Z_ALPHA_975} + {Z_POWER_80})
                 * (a.var + b.var) / (100 * 100), 6) + 0.0
               AS n_per_arm_at_100
    FROM (SELECT * FROM s WHERE grp = '1-URGENT') a
    CROSS JOIN (SELECT * FROM s WHERE grp = '5-LOW') b
    """,
)
def agg_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for the agg_welch_t comparison — the question
    asked BEFORE the experiment: at α = 0.05 (two-sided) and 80%
    power, (a) what mean-difference is detectable at the CURRENT group
    sizes (MDE = (z_{{α/2}} + z_β)·SE), and (b) how many units per arm
    would a $100 difference need (n = 2(z_{{α/2}}+z_β)²·(σ²_a+σ²_b)/Δ²
    with the observed variances)? The z constants are shared double
    LITERALS on both sides (the IDCG_AT_K policy — normal quantiles
    are libm/erf territory, and a power calc's constants ARE model
    constants).

    Determinism: variances come from the agg_welch_t exact-decimal k$
    moment staging (floored dollars → 3 dp, squares exact at scale 6);
    sqrt is correctly rounded IEEE; everything else is literal × exact
    chains.

    Scale: two-group exact-moment aggregate — one shuffle, two rows,
    then closed form.
    """
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    kd = (
        F.floor("o_totalprice").cast("decimal(18,0)")
        * F.lit(0.001).cast("decimal(9,3)")
    ).cast("decimal(18,6)")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(kd).alias("sfx_k"),
        dsum(kd * kd).alias("sxx_k"),
    )
    s = m.select(
        "o_orderpriority",
        "n",
        (
            (F.col("sxx_k") - F.col("sfx_k") * F.col("sfx_k") / F.col("n"))
            / (F.col("n") - 1)
            * 1000000.0
        ).alias("var"),
    )
    a = s.filter(F.col("o_orderpriority") == "1-URGENT").alias("a")
    b = s.filter(F.col("o_orderpriority") == "5-LOW").alias("b")
    zsum = Z_ALPHA_975 + Z_POWER_80
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_urgent"),
        F.col("b.n").alias("n_low"),
        (
            F.round(
                F.lit(zsum)
                * F.sqrt(
                    F.col("a.var") / F.col("a.n")
                    + F.col("b.var") / F.col("b.n")
                ),
                6,
            )
            + 0.0
        ).alias("mde"),
        (
            F.round(
                F.lit(2.0)
                * zsum
                * zsum
                * (F.col("a.var") + F.col("b.var"))
                / (100 * 100),
                6,
            )
            + 0.0
        ).alias("n_per_arm_at_100"),
    )


Z_CI_975 = 1.959963984540054  # two-sided 95% normal quantile (literal)


@query(
    "agg_risk_ratio",
    family="stats",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS in_a,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(sum(in_a * conv) AS BIGINT) AS x_a,
               CAST(count(*) - sum(in_a) AS BIGINT) AS n_b,
               CAST(sum((1 - in_a) * conv) AS BIGINT) AS x_b
        FROM u
    )
    SELECT n_a, x_a, n_b, x_b,
           round((CAST(x_a AS DOUBLE) / n_a)
                 / (CAST(x_b AS DOUBLE) / n_b), 6) + 0.0 AS risk_ratio,
           round(ln((CAST(x_a AS DOUBLE) / n_a)
                    / (CAST(x_b AS DOUBLE) / n_b))
                 - {Z_CI_975} * sqrt(CAST(1 AS DOUBLE) / x_a
                                     - CAST(1 AS DOUBLE) / n_a
                                     + CAST(1 AS DOUBLE) / x_b
                                     - CAST(1 AS DOUBLE) / n_b), 6) + 0.0
               AS log_rr_lo,
           round(ln((CAST(x_a AS DOUBLE) / n_a)
                    / (CAST(x_b AS DOUBLE) / n_b))
                 + {Z_CI_975} * sqrt(CAST(1 AS DOUBLE) / x_a
                                     - CAST(1 AS DOUBLE) / n_a
                                     + CAST(1 AS DOUBLE) / x_b
                                     - CAST(1 AS DOUBLE) / n_b), 6) + 0.0
               AS log_rr_hi,
           (ln((CAST(x_a AS DOUBLE) / n_a) / (CAST(x_b AS DOUBLE) / n_b))
              - {Z_CI_975} * sqrt(CAST(1 AS DOUBLE) / x_a
                                  - CAST(1 AS DOUBLE) / n_a
                                  + CAST(1 AS DOUBLE) / x_b
                                  - CAST(1 AS DOUBLE) / n_b) > 0
            OR
            ln((CAST(x_a AS DOUBLE) / n_a) / (CAST(x_b AS DOUBLE) / n_b))
              + {Z_CI_975} * sqrt(CAST(1 AS DOUBLE) / x_a
                                  - CAST(1 AS DOUBLE) / n_a
                                  + CAST(1 AS DOUBLE) / x_b
                                  - CAST(1 AS DOUBLE) / n_b) < 0)
               AS significant
    FROM c
    """,
)
def agg_risk_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative risk (risk ratio) of conversion between the md5-parity
    A/B user groups, with the Katz log-normal 95% CI — the binary-
    metric experiment readout next to the mean-based agg_welch_t/
    agg_cuped and the distributional agg_qte: conversion = the user
    fired ≥1 'purchase' event. The CI is reported in LOG space
    (lo/hi of ln RR) — exp() back-transforms are libm territory and
    the significance decision (0 ∉ CI ⇔ 1 ∉ RR-CI) is identical in
    either space. SE(ln RR) = √(1/x_a − 1/n_a + 1/x_b − 1/n_b), z is
    a shared double literal (the IDCG policy).

    Determinism: unit counts and conversion counts are exact integers
    from one per-user aggregate; ln is proven bit-identical
    cross-engine (the graph.py ordered folds); the lo/hi/flag all
    reuse the same expression text on both sides.

    Scale: one user-keyed aggregate (map-side partial), then a 1-row
    closed form.
    """
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .select(
            (
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                < "8"
            )
            .cast("int")
            .alias("in_a"),
            "conv",
        )
    )
    c = u.agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.col("in_a") * F.col("conv")).cast("bigint").alias("x_a"),
        (F.count(F.lit(1)) - F.sum("in_a")).cast("bigint").alias("n_b"),
        F.sum((1 - F.col("in_a")) * F.col("conv"))
        .cast("bigint")
        .alias("x_b"),
    )
    rr = (F.col("x_a").cast("double") / F.col("n_a")) / (
        F.col("x_b").cast("double") / F.col("n_b")
    )
    se = F.sqrt(
        F.lit(1.0) / F.col("x_a")
        - F.lit(1.0) / F.col("n_a")
        + F.lit(1.0) / F.col("x_b")
        - F.lit(1.0) / F.col("n_b")
    )
    lo = F.log(rr) - F.lit(Z_CI_975) * se
    hi = F.log(rr) + F.lit(Z_CI_975) * se
    return c.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        (F.round(rr, 6) + 0.0).alias("risk_ratio"),
        (F.round(lo, 6) + 0.0).alias("log_rr_lo"),
        (F.round(hi, 6) + 0.0).alias("log_rr_hi"),
        ((lo > 0) | (hi < 0)).alias("significant"),
    )


@query(
    "agg_uplift_qini",
    family="stats",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS in_a,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv,
               CAST(count(*) AS BIGINT) AS score
        FROM events GROUP BY user_id
    ),
    rk AS (
        SELECT *, row_number() OVER (ORDER BY score DESC, user_id) AS rnk,
               count(*) OVER () AS n
        FROM u
    ),
    dec AS (
        SELECT CAST((rnk - 1) * 10 // n + 1 AS BIGINT) AS decile,
               in_a, conv
        FROM rk
    ),
    per AS (
        SELECT decile,
               CAST(sum(in_a) AS BIGINT) AS n_t,
               CAST(sum(in_a * conv) AS BIGINT) AS x_t,
               CAST(count(*) - sum(in_a) AS BIGINT) AS n_c,
               CAST(sum((1 - in_a) * conv) AS BIGINT) AS x_c
        FROM dec GROUP BY decile
    ),
    cum AS (
        SELECT a.decile,
               CAST(sum(b.n_t) AS BIGINT) AS cn_t,
               CAST(sum(b.x_t) AS BIGINT) AS cx_t,
               CAST(sum(b.n_c) AS BIGINT) AS cn_c,
               CAST(sum(b.x_c) AS BIGINT) AS cx_c
        FROM per a JOIN per b ON b.decile <= a.decile
        GROUP BY a.decile
    )
    SELECT decile, cn_t, cx_t, cn_c, cx_c,
           round(cx_t - CAST(cx_c AS DOUBLE) * cn_t / cn_c, 6) + 0.0
               AS qini
    FROM cum
    """,
)
def agg_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve (uplift-model evaluation) over the md5-parity A/B
    split: users ranked by an activity score (event count — the
    deterministic stand-in for a model's uplift score), cut into
    deciles; at each cumulative decile the Qini value
    x_t − x_c·(n_t/n_c) is the INCREMENTAL conversions the top-k%
    targeting would have bought vs proportional control — the curve
    every uplift/targeting model is judged by (its area vs the random
    diagonal is AUUC). Completes the experimentation shelf: agg_srm
    guards the split, welch/cuped/qte read the effect, risk_ratio the
    binary effect, and Qini reads the TARGETING value.

    Determinism: the decile is an exact integer formula
    ((rnk−1)·10 div n + 1) over a total-order rank — NOT ntile, whose
    remainder distribution is engine-convention; the rank itself comes
    from _util.ordered_prefix engine-side (no single-partition
    WindowExec — the 100 TB-fatal plan) while the oracle's plain
    window is single-node DuckDB's prerogative. Counts are exact
    integers; qini is one division + multiply + subtract.

    Scale: one user aggregate, a range-repartitioned global rank
    (sampled skew-free boundaries, driver state O(#partitions)), one
    10-group aggregate, then a 10×10 cumulative self-join.
    """
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
            F.count(F.lit(1)).cast("bigint").alias("score"),
        )
        .select(
            "user_id",
            (
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                < "8"
            )
            .cast("int")
            .alias("in_a"),
            "conv",
            "score",
        )
    )
    ranked, n = ordered_prefix(u, [F.desc("score"), "user_id"], rank_col="rnk")
    # integer DIV, never a double divide + cast: a correctly-rounded
    # double quotient can round UP across an integer boundary where
    # floor division must not
    dec = ranked.select(
        F.expr(f"CAST((rnk - 1) * 10 DIV {n} AS BIGINT) + 1").alias(
            "decile"
        ),
        "in_a",
        "conv",
    )
    per = dec.groupBy("decile").agg(
        F.sum("in_a").cast("bigint").alias("n_t"),
        F.sum(F.col("in_a") * F.col("conv")).cast("bigint").alias("x_t"),
        (F.count(F.lit(1)) - F.sum("in_a")).cast("bigint").alias("n_c"),
        F.sum((1 - F.col("in_a")) * F.col("conv"))
        .cast("bigint")
        .alias("x_c"),
    ).persist()  # consumed by both sides of the cumulative self-join;
    # leaked by the repo persist convention (10 rows)
    a, b = per.alias("a"), per.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(
            F.sum("b.n_t").cast("bigint").alias("cn_t"),
            F.sum("b.x_t").cast("bigint").alias("cx_t"),
            F.sum("b.n_c").cast("bigint").alias("cn_c"),
            F.sum("b.x_c").cast("bigint").alias("cx_c"),
        )
    )
    return cum.select(
        "decile",
        "cn_t",
        "cx_t",
        "cn_c",
        "cx_c",
        (
            F.round(
                F.col("cx_t")
                - F.col("cx_c").cast("double")
                * F.col("cn_t")
                / F.col("cn_c"),
                6,
            )
            + 0.0
        ).alias("qini"),
    )


HIGH_VALUE_CENTS = 10_000  # 'high-value event' threshold: value > $100


@query(
    "agg_wilson_ci",
    family="stats",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT)
                                  > {HIGH_VALUE_CENTS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, x,
           round(CAST(x AS DOUBLE) / n, 6) + 0.0 AS p_hat,
           round(((CAST(x AS DOUBLE) / n
                   + {Z_CI_975} * {Z_CI_975} / (2 * CAST(n AS DOUBLE)))
                  - {Z_CI_975} * sqrt((CAST(x AS DOUBLE) / n)
                        * (1 - CAST(x AS DOUBLE) / n) / n
                        + {Z_CI_975} * {Z_CI_975}
                          / (4 * CAST(n AS DOUBLE) * n)))
                 / (1 + {Z_CI_975} * {Z_CI_975} / CAST(n AS DOUBLE)), 6)
               + 0.0 AS wilson_lo,
           round(((CAST(x AS DOUBLE) / n
                   + {Z_CI_975} * {Z_CI_975} / (2 * CAST(n AS DOUBLE)))
                  + {Z_CI_975} * sqrt((CAST(x AS DOUBLE) / n)
                        * (1 - CAST(x AS DOUBLE) / n) / n
                        + {Z_CI_975} * {Z_CI_975}
                          / (4 * CAST(n AS DOUBLE) * n)))
                 / (1 + {Z_CI_975} * {Z_CI_975} / CAST(n AS DOUBLE)), 6)
               + 0.0 AS wilson_hi
    FROM c
    """,
)
def agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the high-value-event
    proportion per event_type (value > ${HIGH_VALUE_CENTS // 100}) —
    the proportion CI every dashboard should use instead of the Wald
    interval it usually uses (Wald collapses to zero width at p̂ ∈
    {{0, 1}} and undercovers below n ≈ 40; Wilson is the standard
    remedy, and the one-sample sibling of agg_risk_ratio's two-sample
    log-CI). Closed form with z as the shared double literal (the
    IDCG policy):
        (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    Determinism: counts are exact integers; p̂ is one division; the
    interval is a fixed literal × exact-chain formula with one
    correctly-rounded sqrt — the identical expression text on both
    sides.

    Scale: one map-side-combined aggregate; the threshold predicate
    is pushed to the scan.
    """
    c = t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.round(F.col("value") * 100).cast("bigint")
                > HIGH_VALUE_CENTS,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
    )
    z = Z_CI_975
    p = F.col("x").cast("double") / F.col("n")
    nd = F.col("n").cast("double")
    center = p + z * z / (2 * nd)
    half = F.lit(z) * F.sqrt(p * (1 - p) / F.col("n") + z * z / (4 * nd * nd))
    denom = 1 + z * z / nd
    return c.select(
        "event_type",
        "n",
        "x",
        (F.round(p, 6) + 0.0).alias("p_hat"),
        (F.round((center - half) / denom, 6) + 0.0).alias("wilson_lo"),
        (F.round((center + half) / denom, 6) + 0.0).alias("wilson_hi"),
    )


@query(
    "agg_meta_analysis",
    family="stats",
    oracle="""
    WITH u AS (
        SELECT event_type, user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS in_a,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2, 3
    ),
    per AS (
        SELECT event_type,
               CAST(sum(in_a) AS BIGINT) AS n_a,
               CAST(sum(in_a * cents) AS BIGINT) AS s1a,
               CAST(sum(in_a * cents * cents) AS BIGINT) AS s2a,
               CAST(count(*) - sum(in_a) AS BIGINT) AS n_b,
               CAST(sum((1 - in_a) * cents) AS BIGINT) AS s1b,
               CAST(sum((1 - in_a) * cents * cents) AS BIGINT) AS s2b
        FROM u GROUP BY event_type
    ),
    eff AS (
        SELECT event_type,
               CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b AS d,
               (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * s1a / n_a)
                   / (n_a - 1) / n_a
               + (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * s1b / n_b)
                   / (n_b - 1) / n_b AS se2
        FROM per
    ),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               list_sum(list(d / se2 ORDER BY event_type))
                 / list_sum(list(1 / se2 ORDER BY event_type)) AS mu,
               list_sum(list(1 / se2 ORDER BY event_type)) AS sw
        FROM eff
    ),
    q AS (
        SELECT k, mu, sw,
               list_sum(list((d - mu) * (d - mu) / se2
                             ORDER BY event_type)) AS q_stat
        FROM eff CROSS JOIN pooled
        GROUP BY k, mu, sw
    )
    SELECT k AS k_experiments,
           round(mu / 100, 6) + 0.0 AS pooled_effect,
           round(sqrt(1 / sw) / 100, 6) + 0.0 AS pooled_se,
           round(q_stat, 6) + 0.0 AS q_stat,
           round(CASE WHEN q_stat > k - 1
                      THEN (q_stat - (k - 1)) / q_stat
                      ELSE CAST(0 AS DOUBLE) END, 6) + 0.0 AS i_squared
    FROM q
    """,
)
def agg_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect meta-analysis across the per-event_type A/B
    experiments — the cross-experiment rollup a metrics platform runs
    when one intervention is measured on several surfaces: each
    event_type contributes its user-level mean-spend difference d_i
    with Welch SE²_i; the pooled effect is the inverse-variance
    weighted mean μ = Σ(d_i/SE²_i)/Σ(1/SE²_i) with SE = √(1/Σw); and
    Cochran's Q = Σ w_i(d_i − μ)² with I² = (Q−(k−1))/Q reports how
    much the surfaces genuinely DISAGREE (I² ≈ 0 → pool freely;
    large → the fixed-effect pool is lying, go random-effects). The
    capstone of the experimentation shelf: srm → per-metric tests →
    risk/qte/qini readouts → THIS rolls k of them up.

    Determinism: per-experiment d and SE² are short identical chains
    over exact BIGINT cents moments; the three cross-experiment sums
    of doubles are ORDERED folds (Spark sorted-struct aggregate ≡
    DuckDB list_sum(list(x ORDER BY event_type)) — the established
    identity), never a plain sum(double); μ feeds Q through a 1-row
    broadcast so both engines square the identical residuals.

    Scale: one (event_type, user) aggregate, then k-row arithmetic.
    """
    u = t(spark, sf_dir, "events").groupBy(
        "event_type",
        "user_id",
        (
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8"
        )
        .cast("int")
        .alias("in_a"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    per = u.groupBy("event_type").agg(
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum(F.col("in_a") * F.col("cents")).cast("bigint").alias("s1a"),
        F.sum(F.col("in_a") * F.col("cents") * F.col("cents"))
        .cast("bigint")
        .alias("s2a"),
        (F.count(F.lit(1)) - F.sum("in_a")).cast("bigint").alias("n_b"),
        F.sum((1 - F.col("in_a")) * F.col("cents"))
        .cast("bigint")
        .alias("s1b"),
        F.sum((1 - F.col("in_a")) * F.col("cents") * F.col("cents"))
        .cast("bigint")
        .alias("s2b"),
    )
    eff = per.select(
        "event_type",
        (
            F.col("s1a").cast("double") / F.col("n_a")
            - F.col("s1b").cast("double") / F.col("n_b")
        ).alias("d"),
        (
            (
                F.col("s2a").cast("double")
                - F.col("s1a").cast("double") * F.col("s1a") / F.col("n_a")
            )
            / (F.col("n_a") - 1)
            / F.col("n_a")
            + (
                F.col("s2b").cast("double")
                - F.col("s1b").cast("double") * F.col("s1b") / F.col("n_b")
            )
            / (F.col("n_b") - 1)
            / F.col("n_b")
        ).alias("se2"),
    ).persist()  # consumed by the pool AND Q stages (k rows); leaked
    # by the repo persist convention

    def ofold(expr: str) -> F.Column:
        return F.expr(
            "aggregate(transform(array_sort(collect_list("
            f"struct(event_type, {expr} AS v))), s -> s.v),"
            " CAST(0 AS DOUBLE), (a, x) -> a + x)"
        )

    pooled = eff.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (ofold("d / se2") / ofold("1 / se2")).alias("mu"),
        ofold("1 / se2").alias("sw"),
    )
    q = (
        eff.crossJoin(F.broadcast(pooled))
        .groupBy("k", "mu", "sw")
        .agg(ofold("(d - mu) * (d - mu) / se2").alias("q_stat"))
    )
    return q.select(
        F.col("k").alias("k_experiments"),
        (F.round(F.col("mu") / 100, 6) + 0.0).alias("pooled_effect"),
        (F.round(F.sqrt(1 / F.col("sw")) / 100, 6) + 0.0).alias(
            "pooled_se"
        ),
        (F.round(F.col("q_stat"), 6) + 0.0).alias("q_stat"),
        (
            F.round(
                F.when(
                    F.col("q_stat") > F.col("k") - 1,
                    (F.col("q_stat") - (F.col("k") - 1)) / F.col("q_stat"),
                ).otherwise(F.lit(0.0)),
                6,
            )
            + 0.0
        ).alias("i_squared"),
    )


# --- Sequential testing (round 9: the peeking problem) ---------------
#
# Everything above on the experimentation shelf is FIXED-HORIZON
# (welch_t, permutation_test, srm_check, power_mde, fdr_bh): valid only
# if you look exactly once, at a pre-registered n. A real A/B platform
# shows a live dashboard — analysts peek daily — so it needs tests
# whose guarantees survive continuous monitoring. Two classic shapes:
# the mixture-SPRT always-valid p-value (Robbins 1970 mixture rule, the
# construction behind Howard et al.'s confidence sequences and
# industrial "always-valid inference") and a two-sided CUSUM alarm on
# assignment imbalance (sequential SRM — Page 1954).

MSPRT_TAU2 = 1.0  # mixture variance (dollars^2) — a registered literal
# ln(1/alpha) at alpha = 0.05: rejection threshold for ln(1/p_n)
MSPRT_LN_INV_ALPHA = 2.995732273553991

# Shared expression text (both engines evaluate the identical IEEE
# chain — the win_kalman_1d discipline). Operands v (double), delta
# (double) are MATERIALIZED columns; tau2 is inlined as CAST text.
_MSPRT_T = "CAST(1 AS DOUBLE)"  # tau^2
_MSPRT_LOGL = (
    f"(CAST(0.5 AS DOUBLE) * ln(v / (v + {_MSPRT_T}))"
    f" + ((delta * delta) * {_MSPRT_T})"
    f" / ((CAST(2 AS DOUBLE) * v) * (v + {_MSPRT_T})))"
)
_MSPRT_DELTA = (
    "((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    " / CAST(100 AS DOUBLE))"
)
_MSPRT_V = (
    "(sigma2 * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)"
    " + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE)))"
)
_MSPRT_SIGMA2 = (
    "(((scc - (sc * sc) / tn) / (tn - CAST(1 AS DOUBLE)))"
    " / CAST(10000 AS DOUBLE))"
)


@query(
    "agg_msprt",
    family="stats",
    oracle=f"""
    WITH u AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS a,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    sig AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS tn,
               CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS sc,
               CAST(CAST(sum(c * c) AS BIGINT) AS DOUBLE) AS scc
        FROM u GROUP BY event_type
    ),
    day AS (
        SELECT event_type, d,
               CAST(sum(a) AS BIGINT) AS na_d,
               CAST(count(*) - sum(a) AS BIGINT) AS nb_d,
               CAST(sum(CASE WHEN a = 1 THEN c ELSE 0 END) AS BIGINT)
                   AS sa_d,
               CAST(sum(CASE WHEN a = 0 THEN c ELSE 0 END) AS BIGINT)
                   AS sb_d
        FROM u GROUP BY event_type, d
    ),
    cum AS (
        SELECT event_type, d,
               sum(na_d) OVER w AS n_a, sum(nb_d) OVER w AS n_b,
               sum(sa_d) OVER w AS s_a, sum(sb_d) OVER w AS s_b
        FROM day
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    vd AS (
        SELECT c.event_type, c.d, c.n_a, c.n_b,
               CASE WHEN c.n_a > 0 AND c.n_b > 0
                    THEN {_MSPRT_DELTA} END AS delta,
               CASE WHEN c.n_a > 0 AND c.n_b > 0
                    THEN {_MSPRT_V.replace("sigma2", _MSPRT_SIGMA2)}
               END AS v
        FROM cum c JOIN sig g ON c.event_type = g.event_type
    ),
    ll AS (
        SELECT event_type, d, n_a, n_b,
               CASE WHEN v > 0 THEN {_MSPRT_LOGL} END
                   AS log_lambda
        FROM vd
    ),
    av AS (
        SELECT event_type, d, n_a, n_b, log_lambda,
               greatest(CAST(0 AS DOUBLE), max(log_lambda) OVER
                   (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS ln_inv_p
        FROM ll
    )
    SELECT event_type, d,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(log_lambda, 6) + CAST(0 AS DOUBLE) AS log_lambda,
           round(ln_inv_p, 6) + CAST(0 AS DOUBLE) AS ln_inv_p,
           ln_inv_p > {MSPRT_LN_INV_ALPHA} AS rejected
    FROM av
    WHERE n_a > 0 AND n_b > 0
    """,
)
def agg_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-SPRT always-valid p-value over the daily cumulative
    series — the sequential test that makes peeking safe (VERDICT r8
    #3). Per event_type, users split 50/50 by the platform's md5-parity
    assignment (the agg_srm_check/agg_qte split); each day n the
    cumulative mean difference δ_n feeds the normal mixture likelihood
    ratio with plug-in observation variance σ² and mixture variance
    τ² = {MSPRT_TAU2}:

        Λ_n = sqrt(V_n/(V_n+τ²)) · exp(δ_n²τ²/(2V_n(V_n+τ²))),
        V_n = σ²(1/n_a + 1/n_b)

    Robbins' mixture rule makes Λ_n a nonnegative martingale under
    H₀, so p_n = 1/max_{m≤n} Λ_m is an ALWAYS-VALID p-value: valid at
    every peek simultaneously, no alpha spending schedule needed. The
    null md5 split shows the expected behavior — ln(1/p) hugs 0 and
    never crosses ln(1/α) = {MSPRT_LN_INV_ALPHA} (α = 0.05).

    Determinism: everything stays in LOG space (agg_risk_ratio
    discipline — exp() is libm territory; ln() is the agg_entropy
    precedent): the op emits ln Λ_n and ln(1/p_n) = max(0, running
    max of ln Λ). Daily sums accumulate as exact BIGINT cents; δ, V,
    σ² and ln Λ derive through expression text SHARED verbatim with
    the oracle (module constants _MSPRT_*), so both engines run the
    identical IEEE chain; rounding only at the edge. Days where an arm
    is still empty — or where σ² = 0 (a degenerate all-identical-value
    prefix makes V = 0, so ln Λ would be ln(0) + 0/0) — yield NULL
    ln Λ via a shared v > 0 guard (ADVICE r9; never Inf/NaN — a NaN
    would poison the running max) and the empty-arm days are filtered
    after the windows materialize.

    Scale: one (event_type, day) aggregate over the corpus (map-side
    combined), a per-type σ² aggregate broadcast back, then windows
    over the calendar-bounded day grid — the win_kalman_1d shape. The
    cumulative state is 4 integers per (type, day); a live platform
    checkpoints exactly that row and extends it incrementally.
    """
    e = t(spark, sf_dir, "events")
    u = e.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        (
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
            < "8"
        )
        .cast("int")
        .alias("a"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    sig = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("tn"),
        F.sum("c").cast("bigint").cast("double").alias("sc"),
        F.sum(F.col("c") * F.col("c"))
        .cast("bigint")
        .cast("double")
        .alias("scc"),
    )
    day = u.groupBy("event_type", "d").agg(
        F.sum("a").cast("bigint").alias("na_d"),
        (F.count(F.lit(1)) - F.sum("a")).cast("bigint").alias("nb_d"),
        F.sum(F.when(F.col("a") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sa_d"),
        F.sum(F.when(F.col("a") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sb_d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = day.select(
        "event_type",
        "d",
        F.sum("na_d").over(w).alias("n_a"),
        F.sum("nb_d").over(w).alias("n_b"),
        F.sum("sa_d").over(w).alias("s_a"),
        F.sum("sb_d").over(w).alias("s_b"),
    )
    vd = cum.join(F.broadcast(sig), "event_type").select(
        "event_type",
        "d",
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr(_MSPRT_DELTA),
        ).alias("delta"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr(_MSPRT_V.replace("sigma2", _MSPRT_SIGMA2)),
        ).alias("v"),
    )
    ll = vd.select(
        "event_type",
        "d",
        "n_a",
        "n_b",
        F.when(F.col("v") > 0, F.expr(_MSPRT_LOGL)).alias(
            "log_lambda"
        ),
    )
    av = ll.select(
        "event_type",
        "d",
        "n_a",
        "n_b",
        "log_lambda",
        F.greatest(F.lit(0.0), F.max("log_lambda").over(w)).alias(
            "ln_inv_p"
        ),
    )
    return av.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "event_type",
        "d",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.round("log_lambda", 6) + 0.0).alias("log_lambda"),
        (F.round("ln_inv_p", 6) + 0.0).alias("ln_inv_p"),
        (F.col("ln_inv_p") > MSPRT_LN_INV_ALPHA).alias("rejected"),
    )


CUSUM_AB_H = 4.0  # alarm multiplier: threshold = 4·sqrt(cum exposures)


@query(
    "agg_cusum_ab",
    family="stats",
    oracle=f"""
    WITH day AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                            1, 1) < '8'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                            1, 1) < '8'
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, d, n_a, n_b,
               sum(n_a - n_b) OVER w AS p,
               sum(n_a + n_b) OVER w AS cum_n
        FROM day
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    run AS (
        SELECT event_type, d, n_a, n_b, p, cum_n,
               min(p) OVER w AS run_min,
               max(p) OVER w AS run_max
        FROM cum
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, n_a, n_b,
           CAST(p - least(CAST(0 AS BIGINT), run_min) AS BIGINT)
               AS cusum_pos,
           CAST(greatest(CAST(0 AS BIGINT), run_max) - p AS BIGINT)
               AS cusum_neg,
           CAST(cum_n AS BIGINT) AS cum_n,
           round(CAST({int(CUSUM_AB_H)} AS DOUBLE)
                 * sqrt(CAST(cum_n AS DOUBLE)), 6)
               + CAST(0 AS DOUBLE) AS threshold,
           (p - least(CAST(0 AS BIGINT), run_min)
                > CAST({int(CUSUM_AB_H)} AS DOUBLE)
                  * sqrt(CAST(cum_n AS DOUBLE)))
           OR (greatest(CAST(0 AS BIGINT), run_max) - p
                > CAST({int(CUSUM_AB_H)} AS DOUBLE)
                  * sqrt(CAST(cum_n AS DOUBLE))) AS alarm
    FROM run
    """,
)
def agg_cusum_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential SRM alarm (VERDICT r8 #3's second shape): a
    two-sided Page CUSUM on the daily assignment imbalance
    x_d = n_a − n_b per event_type. agg_srm_check is the fixed-horizon
    chi-square run once; this is the monitor that watches assignment
    health EVERY day and alarms the first day drift accumulates past
    noise — catching a mid-flight bucketing bug (bad hash deploy,
    one-sided logging loss) the terminal test only sees after the
    damage is total.

        S⁺_d = max(0, S⁺_{{d-1}} + x_d),  S⁻_d = max(0, S⁻_{{d-1}} − x_d),
        alarm when either exceeds h_d = {CUSUM_AB_H}·sqrt(Σ exposures)

    (h tracks sqrt(cum_n) because the null imbalance after n fair
    assignments has sd ≈ sqrt(n) — a repeated ~4σ boundary.)

    Determinism: the recursive maxes rewrite to the win_cusum
    prefix-sum identity — S⁺ = P − min(0, running min P),
    S⁻ = max(0, running max P) − P — so the whole statistic is exact
    BIGINT arithmetic over running sums; the only double is the
    sqrt-threshold compare (sqrt is the one correctly-rounded libm
    power). No exp, no ln.

    Scale: one (event_type, day) count aggregate (map-side combined),
    then windows over the calendar-bounded day grid; state per series
    is one (P, min, max, n) tuple — incrementally extensible, the
    streaming-monitor shape.
    """
    e = t(spark, sf_dir, "events")
    in_a = (
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8"
    ).cast("int")
    day = e.select(
        "event_type", F.date_trunc("day", "ts").alias("d"), in_a.alias("a")
    ).groupBy("event_type", "d").agg(
        F.sum("a").cast("bigint").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("a")).cast("bigint").alias("n_b"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = day.select(
        "event_type",
        "d",
        "n_a",
        "n_b",
        F.sum(F.col("n_a") - F.col("n_b")).over(w).alias("p"),
        F.sum(F.col("n_a") + F.col("n_b")).over(w).alias("cum_n"),
    )
    run = cum.select(
        "event_type",
        "d",
        "n_a",
        "n_b",
        "p",
        "cum_n",
        F.min("p").over(w).alias("run_min"),
        F.max("p").over(w).alias("run_max"),
    )
    thr = F.lit(float(CUSUM_AB_H)) * F.sqrt(F.col("cum_n").cast("double"))
    pos = F.col("p") - F.least(F.lit(0).cast("bigint"), F.col("run_min"))
    neg = F.greatest(F.lit(0).cast("bigint"), F.col("run_max")) - F.col("p")
    return run.select(
        "event_type",
        "d",
        "n_a",
        "n_b",
        pos.cast("bigint").alias("cusum_pos"),
        neg.cast("bigint").alias("cusum_neg"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        (F.round(thr, 6) + 0.0).alias("threshold"),
        ((pos > thr) | (neg > thr)).alias("alarm"),
    )


# TOST equivalence margin (dollars) and the one-sided normal critical
# value at alpha = 0.05 (the IDCG shared-literal policy — no erf/ppf).
TOST_MARGIN = 5000.0
Z_ONE_SIDED_95 = 1.6448536269514722


@query(
    "agg_tost",
    family="stats",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS grp,
             count(*) AS n,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DECIMAL(28,6)) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                * CAST(0.001 AS DECIMAL(9,3))
                                AS DECIMAL(18,6))
                           * CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                  * CAST(0.001 AS DECIMAL(9,3))
                                  AS DECIMAL(18,6)))
                  AS DECIMAL(28,6)) AS DOUBLE) AS sxx_k,
             CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                * CAST(0.001 AS DECIMAL(9,3))
                                AS DECIMAL(18,6))) AS DECIMAL(28,6))
                  AS DOUBLE) AS sfx_k
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority
    ),
    s AS (
      SELECT grp, n, sx / n AS mean,
             ((sxx_k - sfx_k * sfx_k / n) / (n - 1))
               * CAST(1000000 AS DOUBLE) AS var
      FROM m
    ),
    p AS (
      SELECT a.n AS n_urgent, b.n AS n_low,
             a.mean - b.mean AS diff,
             sqrt(a.var / a.n + b.var / b.n) AS se
      FROM (SELECT * FROM s WHERE grp = '1-URGENT') a
      CROSS JOIN (SELECT * FROM s WHERE grp = '5-LOW') b
    )
    SELECT n_urgent, n_low,
           round(diff, 6) + CAST(0 AS DOUBLE) AS diff,
           round(se, 6) + CAST(0 AS DOUBLE) AS se,
           round((diff + {TOST_MARGIN}) / se, 6) + CAST(0 AS DOUBLE)
               AS t_lower,
           round(({TOST_MARGIN} - diff) / se, 6) + CAST(0 AS DOUBLE)
               AS t_upper,
           ((diff + {TOST_MARGIN}) / se > {Z_ONE_SIDED_95})
             AND (({TOST_MARGIN} - diff) / se > {Z_ONE_SIDED_95})
               AS equivalent
    FROM p
    """,
)
def agg_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests, Schuirmann 1987) —
    the experimentation shelf's missing direction: welch_t/msprt ask
    "is there a difference?"; TOST asks "can we DECLARE the groups the
    same within a margin?" (the non-inferiority / do-no-harm readout a
    platform needs before shipping a refactor that should not move the
    metric). H0 is |μ_a − μ_b| ≥ δ; equivalence is declared only when
    BOTH one-sided statistics (diff + δ)/se and (δ − diff)/se clear the
    one-sided critical value {Z_ONE_SIDED_95} (normal approximation —
    the literal-quantile policy; at these n the t and z quantiles agree
    to 4 dp). Margin δ = {TOST_MARGIN} $ on mean order value between
    URGENT and LOW priorities (the agg_welch_t pair, whose exact
    decimal moment staging this reuses: Σx exact DECIMAL, Σx² over
    whole-dollar-floored k$ so squares stay exact at scale 6).

    Scale: one partial+final aggregate over the pushed-down priority
    scan, then a 2-row pair — one scan at any corpus size.
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
        F.sum(dec("o_totalprice"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("sx"),
        F.sum(price_k * price_k)
        .cast("decimal(28,6)")
        .cast("double")
        .alias("sxx_k"),
        F.sum(price_k).cast("decimal(28,6)").cast("double").alias("sfx_k"),
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
    p = a.crossJoin(b).select(
        F.col("a.n").alias("n_urgent"),
        F.col("b.n").alias("n_low"),
        (F.col("a.mean") - F.col("b.mean")).alias("diff"),
        F.sqrt(
            F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
        ).alias("se"),
    )
    t_lo = (F.col("diff") + TOST_MARGIN) / F.col("se")
    t_hi = (F.lit(TOST_MARGIN) - F.col("diff")) / F.col("se")
    return p.select(
        "n_urgent",
        "n_low",
        (F.round("diff", 6) + 0.0).alias("diff"),
        (F.round("se", 6) + 0.0).alias("se"),
        (F.round(t_lo, 6) + 0.0).alias("t_lower"),
        (F.round(t_hi, 6) + 0.0).alias("t_upper"),
        ((t_lo > Z_ONE_SIDED_95) & (t_hi > Z_ONE_SIDED_95)).alias(
            "equivalent"
        ),
    )


@query(
    "agg_cohens_d",
    family="stats",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS grp,
             count(*) AS n,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                  AS DECIMAL(28,6)) AS DOUBLE) AS sx,
             CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                * CAST(0.001 AS DECIMAL(9,3))
                                AS DECIMAL(18,6))
                           * CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                  * CAST(0.001 AS DECIMAL(9,3))
                                  AS DECIMAL(18,6)))
                  AS DECIMAL(28,6)) AS DOUBLE) AS sxx_k,
             CAST(CAST(sum(CAST(CAST(floor(o_totalprice) AS DECIMAL(18,0))
                                * CAST(0.001 AS DECIMAL(9,3))
                                AS DECIMAL(18,6))) AS DECIMAL(28,6))
                  AS DOUBLE) AS sfx_k
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority
    ),
    s AS (
      SELECT grp, n, sx / n AS mean,
             (sxx_k - sfx_k * sfx_k / n) * CAST(1000000 AS DOUBLE) AS ss
      FROM m
    ),
    p AS (
      SELECT a.n AS n_urgent, b.n AS n_low,
             a.mean - b.mean AS diff,
             sqrt((a.ss + b.ss)
                  / CAST(a.n + b.n - 2 AS DOUBLE)) AS pooled_sd,
             CAST(a.n + b.n - 2 AS DOUBLE) AS df
      FROM (SELECT * FROM s WHERE grp = '1-URGENT') a
      CROSS JOIN (SELECT * FROM s WHERE grp = '5-LOW') b
    )
    SELECT n_urgent, n_low,
           round(diff, 6) + CAST(0 AS DOUBLE) AS diff,
           round(pooled_sd, 6) + CAST(0 AS DOUBLE) AS pooled_sd,
           round(diff / pooled_sd, 6) + CAST(0 AS DOUBLE) AS cohens_d,
           round((diff / pooled_sd)
                 * (CAST(1 AS DOUBLE)
                    - CAST(3 AS DOUBLE)
                      / (CAST(4 AS DOUBLE) * df - CAST(1 AS DOUBLE))), 6)
               + CAST(0 AS DOUBLE) AS hedges_g
    FROM p
    """,
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size for the URGENT-vs-LOW order-value
    comparison: Cohen's d = (μ_a − μ_b)/s_pooled plus Hedges' g
    small-sample correction g = d·(1 − 3/(4·df − 1)) — the REPORTING
    layer the experimentation shelf lacked: welch_t answers "is it
    significant", power_mde answers "what could we detect", tost
    answers "is it equivalent"; the effect size answers "how BIG is
    it" in units every experiment shares (the number a meta-analysis
    like agg_meta_analysis pools). The correction uses the exact
    algebraic approximation (Hedges 1981) — a rational expression, no
    gamma function, so it is cross-engine exact.

    Determinism: the agg_welch_t decimal staging (Σx exact DECIMAL,
    Σx² over whole-dollar-floored k$ exact at scale 6); pooled SD is
    one sqrt over a fixed-order double chain; rounding at the edge.

    Scale: one partial+final aggregate over the pushed-down priority
    scan, then a 2-row pair — one scan at any corpus size.
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
        F.sum(dec("o_totalprice"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("sx"),
        F.sum(price_k * price_k)
        .cast("decimal(28,6)")
        .cast("double")
        .alias("sxx_k"),
        F.sum(price_k).cast("decimal(28,6)").cast("double").alias("sfx_k"),
    )
    s = m.select(
        "grp",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        (
            (F.col("sxx_k") - F.col("sfx_k") * F.col("sfx_k") / F.col("n"))
            * F.lit(1000000.0)
        ).alias("ss"),
    )
    a = s.filter(F.col("grp") == "1-URGENT").alias("a")
    b = s.filter(F.col("grp") == "5-LOW").alias("b")
    p = a.crossJoin(b).select(
        F.col("a.n").alias("n_urgent"),
        F.col("b.n").alias("n_low"),
        (F.col("a.mean") - F.col("b.mean")).alias("diff"),
        F.sqrt(
            (F.col("a.ss") + F.col("b.ss"))
            / (F.col("a.n") + F.col("b.n") - 2).cast("double")
        ).alias("pooled_sd"),
        (F.col("a.n") + F.col("b.n") - 2).cast("double").alias("df"),
    )
    d = F.col("diff") / F.col("pooled_sd")
    g = d * (
        F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * F.col("df") - F.lit(1.0))
    )
    return p.select(
        "n_urgent",
        "n_low",
        (F.round("diff", 6) + 0.0).alias("diff"),
        (F.round("pooled_sd", 6) + 0.0).alias("pooled_sd"),
        (F.round(d, 6) + 0.0).alias("cohens_d"),
        (F.round(g, 6) + 0.0).alias("hedges_g"),
    )


# --- group-sequential test (O'Brien–Fleming), round 10 -----------------

GST_K = 5  # scheduled interim looks
# O'Brien–Fleming group-sequential critical value for K=5 equally
# spaced looks, two-sided alpha=0.05 (Jennison & Turnbull Table 2.3 /
# Pocock 1982: C_B(5, 0.05) = 2.040): the look-k Z boundary is
# C_B * sqrt(K/k), i.e. 4.562, 3.226, 2.634, 2.281, 2.040 — very hard
# to cross early, ~fixed-horizon at the final look.
GST_OBF_C = 2.0401

_GST_Z = (
    f"({_MSPRT_DELTA} / sqrt({_MSPRT_V.replace('sigma2', _MSPRT_SIGMA2)}))"
)
# arm-presence + degenerate-variance guard (the agg_msprt v > 0
# policy: an all-identical-value prefix makes V = 0 and Z = x/0)
_GST_Z_OK = f"(n_a > 0 AND n_b > 0 AND {_MSPRT_SIGMA2} > 0)"
_GST_BOUND = (
    f"(CAST({GST_OBF_C} AS DOUBLE)"
    f" * sqrt(CAST({GST_K} AS DOUBLE) / CAST(look_k AS DOUBLE)))"
)


@query(
    "agg_gst_obrien_fleming",
    family="stats",
    oracle=f"""
    WITH u AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 1 ELSE 0 END AS a,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    sig AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS tn,
               CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS sc,
               CAST(CAST(sum(c * c) AS BIGINT) AS DOUBLE) AS scc,
               CAST(count(*) AS BIGINT) AS tot_n
        FROM u GROUP BY event_type
    ),
    day AS (
        SELECT event_type, d,
               CAST(sum(a) AS BIGINT) AS na_d,
               CAST(count(*) - sum(a) AS BIGINT) AS nb_d,
               CAST(sum(CASE WHEN a = 1 THEN c ELSE 0 END) AS BIGINT)
                   AS sa_d,
               CAST(sum(CASE WHEN a = 0 THEN c ELSE 0 END) AS BIGINT)
                   AS sb_d
        FROM u GROUP BY event_type, d
    ),
    cum AS (
        SELECT event_type, d,
               sum(na_d) OVER w AS n_a, sum(nb_d) OVER w AS n_b,
               sum(sa_d) OVER w AS s_a, sum(sb_d) OVER w AS s_b
        FROM day
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    looks AS (SELECT k AS look_k FROM (VALUES (1), (2), (3), (4), (5))
              AS t(k)),
    look_day AS (
        SELECT c.event_type, l.look_k, min(c.d) AS d
        FROM cum c
        JOIN sig g ON c.event_type = g.event_type
        CROSS JOIN looks l
        WHERE (c.n_a + c.n_b) * {GST_K}
              >= CAST(l.look_k AS BIGINT) * g.tot_n
        GROUP BY c.event_type, l.look_k
    ),
    at_look AS (
        SELECT ld.event_type, ld.look_k, ld.d,
               c.n_a, c.n_b, c.s_a, c.s_b, g.tn, g.sc, g.scc, g.tot_n
        FROM look_day ld
        JOIN cum c ON ld.event_type = c.event_type AND ld.d = c.d
        JOIN sig g ON ld.event_type = g.event_type
    ),
    z AS (
        SELECT event_type, look_k, d, n_a, n_b,
               CAST(n_a + n_b AS DOUBLE) / CAST(tot_n AS DOUBLE)
                   AS info_frac,
               CASE WHEN {_GST_Z_OK} THEN {_GST_Z} END AS zstat,
               {_GST_BOUND} AS bound
        FROM at_look
    )
    SELECT event_type, look_k, d,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(info_frac, 6) + CAST(0 AS DOUBLE) AS info_frac,
           round(zstat, 6) + CAST(0 AS DOUBLE) AS z,
           round(bound, 6) + CAST(0 AS DOUBLE) AS boundary,
           abs(zstat) >= bound AS rejected
    FROM z
    """,
)
def agg_gst_obrien_fleming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential test with O'Brien–Fleming boundaries — the
    scheduled-looks member completing the sequential-testing shelf
    (VERDICT r9 #7): agg_msprt is always-valid (peek anytime),
    agg_cusum_ab is the SRM alarm, and THIS is the industry-standard
    K-scheduled-interim-analyses design (the regulatory/clinical and
    large-platform default). K = {GST_K} looks at information
    fractions k/K; look k fires on the FIRST day the cumulative
    sample count reaches k/K of the corpus total (the compare is
    exact BIGINT: cum_n·K ≥ k·tot_n). At each look the two-arm
    Z-statistic (the agg_msprt md5-split and exact-cents moments;
    Z = δ/√V with the plug-in σ²) meets the O'Brien–Fleming boundary
    C·√(K/k) — literals + sqrt only, no libm beyond the one
    correctly-rounded IEEE op (the agg_power_mde normal-quantile
    policy).

    Determinism: daily/cumulative moments are exact BIGINT cents; δ,
    V, σ², Z and the boundary derive through expression text SHARED
    verbatim with the oracle (_GST_Z/_GST_BOUND reuse the _MSPRT_*
    fragments), so both engines run the identical IEEE chain;
    info_frac is one double division of exact BIGINTs; rounding only
    at the edge, `rejected` compares the unrounded doubles.

    Scale: the same one-pass shape as agg_msprt — one (event_type,
    day) aggregate (map-side combined), a per-type totals aggregate
    broadcast back, cumulative windows over the calendar-bounded day
    grid, and a {GST_K}-row literal broadcast theta-join to place the
    looks. A live platform stores 4 integers per (type, day) and
    evaluates each look once — this query IS that evaluation replayed
    over history.
    """
    e = t(spark, sf_dir, "events")
    u = e.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        (
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
            < "8"
        )
        .cast("int")
        .alias("a"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    sig = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("tn"),
        F.sum("c").cast("bigint").cast("double").alias("sc"),
        F.sum(F.col("c") * F.col("c"))
        .cast("bigint")
        .cast("double")
        .alias("scc"),
        F.count(F.lit(1)).cast("bigint").alias("tot_n"),
    )
    day = u.groupBy("event_type", "d").agg(
        F.sum("a").cast("bigint").alias("na_d"),
        (F.count(F.lit(1)) - F.sum("a")).cast("bigint").alias("nb_d"),
        F.sum(F.when(F.col("a") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sa_d"),
        F.sum(F.when(F.col("a") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sb_d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = day.select(
        "event_type",
        "d",
        F.sum("na_d").over(w).alias("n_a"),
        F.sum("nb_d").over(w).alias("n_b"),
        F.sum("sa_d").over(w).alias("s_a"),
        F.sum("sb_d").over(w).alias("s_b"),
    )
    looks = spark.range(1, GST_K + 1).select(
        F.col("id").cast("int").alias("look_k")
    )
    look_day = (
        cum.join(F.broadcast(sig.select("event_type", "tot_n")), "event_type")
        .crossJoin(F.broadcast(looks))
        .filter(
            (F.col("n_a") + F.col("n_b")) * GST_K
            >= F.col("look_k").cast("bigint") * F.col("tot_n")
        )
        .groupBy("event_type", "look_k")
        .agg(F.min("d").alias("d"))
    )
    at_look = look_day.join(cum, ["event_type", "d"]).join(
        F.broadcast(sig), "event_type"
    )
    z = at_look.select(
        "event_type",
        "look_k",
        "d",
        "n_a",
        "n_b",
        (
            (F.col("n_a") + F.col("n_b")).cast("double")
            / F.col("tot_n").cast("double")
        ).alias("info_frac"),
        F.when(F.expr(_GST_Z_OK), F.expr(_GST_Z)).alias("zstat"),
        F.expr(_GST_BOUND).alias("bound"),
    )
    return z.select(
        "event_type",
        "look_k",
        "d",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.round("info_frac", 6) + 0.0).alias("info_frac"),
        (F.round("zstat", 6) + 0.0).alias("z"),
        (F.round("bound", 6) + 0.0).alias("boundary"),
        (F.abs(F.col("zstat")) >= F.col("bound")).alias("rejected"),
    )


# --- polynomial-kernel MMD two-sample test (round 10) -------------------

# exact integer staging: whole dollars (floor, the agg_cohens_d
# discipline — round() HALF-UP vs bankers could diverge on .5 cents)
_MMD_D = "CAST(floor(o_totalprice) AS BIGINT)"
# O(1) working units: dollars / 1e5 (typical order ≈ 1.5 units), so the
# kernel offset c = 1 and the three moment terms are balanced
_MMD_MU = "(s1_{a} / (CAST(100000 AS DOUBLE) * CAST(n_{a} AS DOUBLE)))"
_MMD_M2 = "(s2_{a} / (CAST(10000000000 AS DOUBLE) * CAST(n_{a} AS DOUBLE)))"
_MMD_M3 = (
    "(s3_{a} / (CAST(1000000000000000 AS DOUBLE) * CAST(n_{a} AS DOUBLE)))"
)
_MMD_T1 = "(CAST(3 AS DOUBLE) * ((mu_x - mu_y) * (mu_x - mu_y)))"
_MMD_T2 = "(CAST(3 AS DOUBLE) * ((m2_x - m2_y) * (m2_x - m2_y)))"
_MMD_T3 = "((m3_x - m3_y) * (m3_x - m3_y))"


def _mmd_sums_sql(alias: str) -> str:
    d = _MMD_D
    return (
        f"CAST(count(*) AS BIGINT) AS n_{alias}, "
        f"CAST(sum(CAST({d} AS DECIMAL(20,0))) AS DOUBLE) AS s1_{alias}, "
        f"CAST(sum(CAST({d} * {d} AS DECIMAL(24,0))) AS DOUBLE) "
        f"AS s2_{alias}, "
        f"CAST(sum(CAST(({d} * {d}) * {d} AS DECIMAL(28,0))) AS DOUBLE) "
        f"AS s3_{alias}"
    )


@query(
    "agg_mmd_poly",
    family="stats",
    oracle=f"""
    WITH x AS (
        SELECT {_mmd_sums_sql("x")} FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ),
    y AS (
        SELECT {_mmd_sums_sql("y")} FROM orders
        WHERE o_orderpriority = '5-LOW'
    ),
    mom AS (
        SELECT n_x, n_y,
               {_MMD_MU.format(a="x")} AS mu_x,
               {_MMD_MU.format(a="y")} AS mu_y,
               {_MMD_M2.format(a="x")} AS m2_x,
               {_MMD_M2.format(a="y")} AS m2_y,
               {_MMD_M3.format(a="x")} AS m3_x,
               {_MMD_M3.format(a="y")} AS m3_y
        FROM x CROSS JOIN y
    )
    SELECT n_x, n_y,
           round({_MMD_T1}, 8) + CAST(0 AS DOUBLE) AS mean_term,
           round({_MMD_T2}, 8) + CAST(0 AS DOUBLE) AS m2_term,
           round({_MMD_T3}, 8) + CAST(0 AS DOUBLE) AS m3_term,
           round((({_MMD_T1} + {_MMD_T2}) + {_MMD_T3}), 8)
               + CAST(0 AS DOUBLE) AS mmd2
    FROM mom
    """,
)
def agg_mmd_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum Mean Discrepancy two-sample test with a degree-3
    polynomial kernel over the URGENT/LOW order-value pair — the
    DISTRIBUTION-level comparison completing the shelf above the
    mean-level tests (welch_t/cohens_d compare means; ks_test compares
    CDFs rank-wise; this compares kernel mean embeddings).

    The key identity that makes it exact and one-pass: for
    k(a,b) = (c + ab)³ with INDEPENDENT draws, E[k] factorizes through
    moments (E[(ab)^p] = E[a^p]·E[b^p]), so the biased MMD² collapses
    to pure moment matching:

        MMD² = 3c²(μx−μy)² + 3c(m2x−m2y)² + (m3x−m3y)²

    — mean shift, second-moment shift, and third-moment (skew) shift,
    each non-negative. No n² kernel matrix exists anywhere: the whole
    statistic derives from six sums. (The Gaussian-kernel MMD would
    need exp() — libm territory — and a quadratic-cost kernel matrix;
    the polynomial kernel is the principled exact alternative, and
    degree 3 is the lowest degree that sees skew.)

    Determinism: per-arm sums of whole dollars (floor-staged like
    agg_cohens_d) accumulate as exact DECIMAL from BIGINT terms —
    d³ ≤ 2.2e17 fits a BIGINT per row, the DECIMAL(28,0) sum is exact
    at any corpus size, and both engines cast the identical exact
    integer to DOUBLE (correctly-rounded in both). Every double
    expression after that is text-shared (_MMD_* fragments), c = 1 in
    dollars/1e5 units so the three terms are comparably scaled.

    Scale: ONE pushed-down scan of orders (two partial-aggregated
    branches of the same predicate family), a 1×1-row cross join, and
    pure literal arithmetic — the cheapest possible two-sample test
    at 100 TB, and an always-fresh DQ monitor when pointed at
    yesterday-vs-today partitions.
    """
    o = t(spark, sf_dir, "orders")

    def arm(pri: str, alias: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderpriority") == pri)
            .select(F.expr(_MMD_D).alias("d"))
            .selectExpr(
                f"CAST(count(*) AS BIGINT) AS n_{alias}",
                f"CAST(sum(CAST(d AS DECIMAL(20,0))) AS DOUBLE) "
                f"AS s1_{alias}",
                f"CAST(sum(CAST(d * d AS DECIMAL(24,0))) AS DOUBLE) "
                f"AS s2_{alias}",
                f"CAST(sum(CAST((d * d) * d AS DECIMAL(28,0))) AS DOUBLE) "
                f"AS s3_{alias}",
            )
        )

    mom = (
        arm("1-URGENT", "x")
        .crossJoin(arm("5-LOW", "y"))
        .selectExpr(
            "n_x",
            "n_y",
            f"{_MMD_MU.format(a='x')} AS mu_x",
            f"{_MMD_MU.format(a='y')} AS mu_y",
            f"{_MMD_M2.format(a='x')} AS m2_x",
            f"{_MMD_M2.format(a='y')} AS m2_y",
            f"{_MMD_M3.format(a='x')} AS m3_x",
            f"{_MMD_M3.format(a='y')} AS m3_y",
        )
    )
    return mom.selectExpr(
        "n_x",
        "n_y",
        f"round({_MMD_T1}, 8) + CAST(0 AS DOUBLE) AS mean_term",
        f"round({_MMD_T2}, 8) + CAST(0 AS DOUBLE) AS m2_term",
        f"round({_MMD_T3}, 8) + CAST(0 AS DOUBLE) AS m3_term",
        f"round((({_MMD_T1} + {_MMD_T2}) + {_MMD_T3}), 8)"
        " + CAST(0 AS DOUBLE) AS mmd2",
    )
