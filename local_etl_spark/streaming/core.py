"""Windowed/stateful transforms shared by batch queries and streams.

Each function is ``DataFrame -> DataFrame`` and is valid on BOTH a batch
DataFrame and a ``readStream`` DataFrame — one definition, two execution
modes. The batch mode is what the DuckDB oracle checks
(queries/streaming.py); tests/test_streaming.py re-runs the same
functions under Structured Streaming with a file source and asserts the
results converge to the batch answer.

Scale notes (1000-executor / 100 TB):
  - Windowed aggregations shuffle once on (key, window); state lives in
    the executor state store partitioned the same way — no second
    shuffle between micro-batches.
  - Watermarks bound state: without them session/dedup state grows
    without limit. Every streaming entry point here takes a
    ``watermark`` arg for that reason; batch mode ignores it.
  - ``session_window`` uses Spark's native merging-session state
    operator rather than a sort-within-partition emulation, so skewed
    users don't serialize a whole partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

GAP = "30 minutes"


def _dsum(c: Column) -> Column:
    # Exact-decimal sum emitted as DOUBLE (engine-wide determinism policy,
    # see queries/_util.py).
    return F.sum(c.cast("decimal(18,6)")).cast("decimal(28,6)").cast("double")


def _is_streaming(df: DataFrame) -> bool:
    return df.isStreaming


def _maybe_watermark(df: DataFrame, watermark: str | None) -> DataFrame:
    if watermark and _is_streaming(df):
        return df.withWatermark("ts", watermark)
    return df


def tumbling_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour tumbling window: count + value sum per (window, event_type)."""
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour window sliding every 15 minutes: count + value sum.

    Each event lands in exactly 4 windows (duration/slide); Spark
    expands to the window set and aggregates once — the expansion is a
    projection, not a self-join.
    """
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )


def session_aggregate(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap.

    Session semantics (Spark's, asserted against a lag/gap/cumsum oracle
    in SQL): an event joins the previous session iff it arrives strictly
    less than GAP after it; session end = last event + GAP.
    """
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "total_value",
        )
    )


# dynamic-gap sessionization timeouts (minutes): purchases keep
# sessions alive longer. ONE definition for the batch query, the
# streaming query, and both their oracle texts (ADVICE r5: the two
# query-side copies had hardcoded literals that could silently drift).
SESSION_GAP_PURCHASE = 30
SESSION_GAP_OTHER = 10


def session_aggregate_dynamic(
    events: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Per-user sessions with a PER-EVENT dynamic inactivity gap:
    purchases hold the session open SESSION_GAP_PURCHASE minutes,
    everything else SESSION_GAP_OTHER — the engagement-weighted
    timeout session_window supports natively (and the manual
    lag/cumsum construction cannot express as one flag). Runs
    unchanged in batch and streaming; the streaming form merges
    session state across micro-batches and the replay test asserts
    exact convergence to the batch answer."""
    gap = F.when(
        F.col("event_type") == "purchase",
        F.lit(f"{SESSION_GAP_PURCHASE} minutes"),
    ).otherwise(F.lit(f"{SESSION_GAP_OTHER} minutes"))
    return (
        _maybe_watermark(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


def dedup_events(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Keep one event per (user_id, event_type).

    Streaming mode: stateful ``dropDuplicates`` — keeps the first
    *arrival*, with watermark-bounded state. Batch mode: deterministic
    keep-first-by-(ts, event_id) via row_number, which equals the
    streaming answer whenever arrival order is event-time order (true
    for replay of a time-ordered log, as in the tests).
    """
    if _is_streaming(events):
        return _maybe_watermark(events, watermark).dropDuplicates(
            ["user_id", "event_type"]
        )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_events_within_watermark(
    events: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Keep one event per (user_id, event_type) with BOUNDED state
    (Spark 3.5 ``dropDuplicatesWithinWatermark``).

    Plain streaming ``dropDuplicates`` retains one state row per key
    FOREVER — on an unbounded key space the state store grows without
    bound, which is the scale-killer of long-running dedup streams.
    The within-watermark variant evicts a key's state once the
    watermark passes its event time + delay; the price is the relaxed
    contract: a duplicate arriving after eviction RE-EMITS (exactly-
    once dedup only within the delay, at-least-once beyond it).
    tests/test_streaming.py pins both halves — a dup inside the delay
    is dropped, a re-occurrence beyond it re-emits.

    Batch mode: keep-first-by-(ts, event_id) row_number — equal to the
    streaming answer whenever all of a key's duplicates fall within
    the delay (true for the oracle corpus replay).
    """
    if _is_streaming(events):
        return events.withWatermark(
            "ts", delay
        ).dropDuplicatesWithinWatermark(["user_id", "event_type"])
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def user_totals(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-user lifetime totals — the custom-stateful-operator example.

    Streaming mode: ``applyInPandasWithState`` holds one (count, sum)
    state row per user in the state store and emits the updated totals
    every micro-batch (update semantics). This is the extension point
    for operators Spark lacks natively — per-key state machines,
    session enrichment, online features. Batch mode: a plain groupBy —
    which is also what the final streaming state must equal (asserted
    in tests/test_streaming.py with float tolerance: pandas sums in
    arrival order, the batch agg in decimal).

    Scale: state is partitioned by the group key, same as the shuffle;
    a watermark must bound key cardinality in production (here the key
    space is small, so NoTimeout keeps the example sharp).
    """
    if _is_streaming(events):

        def update(key, pdfs, state):
            import pandas as pd

            (user_id,) = key
            cnt, tot = state.get if state.exists else (0, 0.0)
            for pdf in pdfs:
                cnt += len(pdf)
                tot += float(pdf["value"].sum())
            state.update((cnt, tot))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [cnt], "total_value": [tot]}
            )

        return (
            _maybe_watermark(events, watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType="user_id long, n_events long, total_value double",
                stateStructType="cnt long, tot double",
                outputMode="update",
                timeoutConf="NoTimeout",
            )
        )
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value")
    )


def late_data_filter(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Batch emulation of watermark drop semantics over an ordered replay.

    Streaming: ``withWatermark`` drops events older than
    max(event time seen) - delay. Batch twin: replay in ``event_id``
    (arrival) order, track the running max of ``ts``, drop rows behind
    the moving watermark. Used by ``stream_watermark`` (rows-only check)
    and asserted equal to real watermark behavior in the streaming test.

    The running max is an ``ordered_prefix`` prefix-max (range
    partitions on arrival order + broadcast per-partition offsets), not
    a bare ORDER BY window — the latter is a single-partition
    WindowExec, which would funnel the whole replay through one task.
    """
    from local_etl_spark.queries._util import ordered_prefix

    delay_expr = F.expr(f"INTERVAL {delay}")
    cum, _n = ordered_prefix(
        events, ["event_id"], prefix=(("ts", "max", "_ts_max"),)
    )
    return (
        cum.withColumn("_wm", F.col("_ts_max") - delay_expr)
        .filter(F.col("ts") >= F.col("_wm"))
        .drop("_wm", "_ts_max")
    )


def watermarked_tumbling(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Tumbling counts over the watermark-surviving subset (batch twin).

    In streaming mode this is ``withWatermark(delay)`` + window agg in
    append mode; batch mode applies ``late_data_filter`` explicitly.
    The single-column global sort in the batch twin exists only to make
    the replay order deterministic for the oracle — the streaming path
    has no such sort.
    """
    if _is_streaming(events):
        return tumbling_counts(events, watermark=delay)
    return tumbling_counts(late_data_filter(events, delay))


LOOKBACK = "1 hour"


def click_attribution(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding hour (attribution).

    Streaming mode: Spark's watermarked stream-stream inner join — both
    sides buffer in the state store, the event-time bound
    (click in [purchase - 1h, purchase]) lets the engine evict a
    buffered row once the other side's watermark passes its match
    horizon, so state is bounded by (watermark + lookback), not by the
    stream. The watermark must be >= the lookback or matches could be
    evicted before they pair (inner-join completeness contract).
    Batch mode: the identical join expression; on a time-ordered replay
    the streaming answer converges to exactly this (asserted in
    tests/test_streaming.py; DuckDB oracle via queries/streaming.py).

    Scale: shuffles both sides once on user_id (the equi part of the
    condition); the range residual evaluates within matched key groups.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    if _is_streaming(events):
        wm = watermark or "2 hours"
        purchases = purchases.withWatermark("purchase_ts", wm)
        clicks = clicks.withWatermark("click_ts", wm)
    cond = (
        (purchases.user_id == clicks.click_user)
        & (clicks.click_ts > purchases.purchase_ts - F.expr(f"INTERVAL {LOOKBACK}"))
        & (clicks.click_ts <= purchases.purchase_ts)
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )


def attributed_purchases(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Stream-stream LEFT SEMI join: purchases that had ≥1 click by the
    same user in the preceding hour — the attribution FILTER (who
    converted) where click_attribution is the attribution FAN-OUT
    (which clicks converted them).

    Streaming mode: watermarked left-semi stream-stream join — the
    purchase side emits each row at most ONCE on first match (no
    duplicate purchases when several clicks qualify), clicks buffer in
    the state store and evict once the purchase watermark passes their
    match horizon; same state bound as the inner join,
    (watermark + lookback). Batch mode: the identical left_semi join
    expression; DuckDB oracle is the equivalent EXISTS (semi join IS
    decorrelated EXISTS — both engines plan it that way).

    Scale: like the inner variant, one shuffle of each side on user_id;
    semi joins additionally stop probing a key group at first match and
    never replicate the build side into the output — strictly cheaper
    than inner + distinct, which is the plan this operator replaces.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    if _is_streaming(events):
        wm = watermark or "2 hours"
        purchases = purchases.withWatermark("purchase_ts", wm)
        clicks = clicks.withWatermark("click_ts", wm)
    cond = (
        (purchases.user_id == clicks.click_user)
        & (clicks.click_ts > purchases.purchase_ts - F.expr(f"INTERVAL {LOOKBACK}"))
        & (clicks.click_ts <= purchases.purchase_ts)
    )
    return purchases.join(clicks, cond, "left_semi").select(
        "purchase_id", "user_id", "purchase_ts"
    )


def click_attribution_outer(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase, with its
    attributing clicks where they exist and NULL click columns where
    none do — the shape reporting needs (conversion rate wants the
    unconverted rows too).

    Streaming mode: watermarked left-outer stream-stream join. Matched
    rows emit like the inner join; a NULL-extended row for an unmatched
    purchase emits only once BOTH watermarks pass the purchase's match
    horizon (the engine must prove no future click can match before it
    may say "none did") — so outer results trail the watermark, and a
    batch-parity check must cut at the flushed horizon
    (tests/test_streaming.py::test_outer_join_equals_batch).
    Batch mode: the identical left_outer join expression. State bound:
    (watermark + lookback), same as the inner variant.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    if _is_streaming(events):
        wm = watermark or "2 hours"
        purchases = purchases.withWatermark("purchase_ts", wm)
        clicks = clicks.withWatermark("click_ts", wm)
    cond = (
        (purchases.user_id == clicks.click_user)
        & (clicks.click_ts > purchases.purchase_ts - F.expr(f"INTERVAL {LOOKBACK}"))
        & (clicks.click_ts <= purchases.purchase_ts)
    )
    return purchases.join(clicks, cond, "left_outer").select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )


def user_totals_tws(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-user totals on transformWithStateInPandas — Spark 4's
    successor to applyInPandasWithState (user_totals above): typed
    state handles (ValueState/ListState/MapState), timers, TTL, and
    initial-state support instead of one opaque state tuple. Same
    operator semantics, next-generation extension point.

    Value determinism: the accumulator is integer CENTS (the corpus
    values are 2dp), so per-key totals are exact regardless of arrival
    or partition order — no float tolerance needed, unlike user_totals.

    ENVIRONMENT GATE: transformWithState's state-server protocol needs
    ``google.protobuf``, which this container does not ship (verified:
    the driver worker dies with ImportError in
    transform_with_state_driver_worker.py; no network to install).
    tests/test_streaming.py::test_tws_totals_or_documented_gap runs the
    operator when protobuf is importable and otherwise pins the exact
    failure mode, so the gate is evidence, not an excuse — on any
    standard cluster (protobuf ships with every Spark distro's Python
    env) this function is live code. applyInPandasWithState
    (user_totals) remains the in-container stateful path.

    Scale: state partitioned by the grouping key, one shuffle; the
    state store holds 16 bytes per user.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "cnt long, cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            cnt, cents = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                cnt += len(pdf)
                # exact: 2dp doubles -> integer cents
                cents += int(round(float(pdf["value"].sum() * 100)))
            self._state.update((cnt, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        _maybe_watermark(events, watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            TotalsProcessor(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="update",
            timeMode="None",
        )
    )


def click_attribution_full(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Stream-stream FULL OUTER interval join: every purchase AND every
    click — matched pairs where attribution holds, a NULL-click row for
    each unconverted purchase, and a NULL-purchase row for each click
    that never led to a purchase within the lookback. The one-query
    answer to "conversion rate AND wasted-click rate".

    Streaming mode: Spark's watermarked full-outer stream-stream join
    (supported since 3.1). Matched rows emit like the inner join; a
    NULL-extended row on EITHER side emits only once both watermarks
    pass that row's match horizon — a purchase can match clicks in
    [purchase_ts - lookback, purchase_ts], a click can match purchases
    in [click_ts, click_ts + lookback), so state for both sides evicts
    at (watermark + lookback). Batch-parity tests must cut at the
    flushed horizon on BOTH sides (null-extended clicks trail the
    purchase watermark and vice versa).
    Batch mode: the identical full_outer join expression; the DuckDB
    oracle is the equivalent FULL JOIN.

    Scale: one shuffle of each side on user_id (the equi component);
    the interval residual evaluates inside key groups. State is
    bounded, not stream-length: (watermark + lookback) per side.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    if _is_streaming(events):
        wm = watermark or "2 hours"
        purchases = purchases.withWatermark("purchase_ts", wm)
        clicks = clicks.withWatermark("click_ts", wm)
    cond = (
        (purchases.purchase_user == clicks.click_user)
        & (clicks.click_ts > purchases.purchase_ts - F.expr(f"INTERVAL {LOOKBACK}"))
        & (clicks.click_ts <= purchases.purchase_ts)
    )
    return purchases.join(clicks, cond, "full_outer").select(
        "purchase_id",
        F.coalesce("purchase_user", "click_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def chained_window_agg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Two chained stateful windowed aggregations in ONE query: 15-min
    tumbling (value sum per event_type) re-aggregated into 1-hour
    windows carrying the peak and mean 15-min sub-window load — the
    classic downsample-then-rollup telemetry shape.

    Streaming mode: Spark 3.4+ chained time-window aggregation — the
    second ``groupBy(window(window_col, ...))`` consumes the FIRST
    aggregation's window struct directly (event-time propagates through
    ``window_time``), so both stateful operators run in one streaming
    query with one watermark. Before 3.4 this took two queries glued by
    a sink. Batch mode: the identical plan; DuckDB oracle re-derives
    both levels from epoch-floor buckets.

    Determinism: sub-window sums use the exact-decimal fold; the
    re-agg's max/avg read those already-exact doubles (hour max is
    order-insensitive; the mean divides an exact decimal-backed sum by
    a count), so both levels are bit-stable at any parallelism.

    Scale: level 1 shuffles once on (window, event_type) behind a
    partial agg; level 2 reuses the same hash partitioning (the hour
    key is a function of the 15-min key — ENSURE_REQUIREMENTS inserts
    no extra exchange on event_type-partitioned data) and reduces 4:1.
    State per key is one row per live window — watermark-bounded.
    """
    sub = (
        _maybe_watermark(events, watermark)
        .groupBy(F.window("ts", "15 minutes").alias("w15"), "event_type")
        .agg(_dsum(F.col("value")).alias("sub_total"), F.count("*").alias("sub_n"))
    )
    return (
        sub.groupBy(F.window("w15", "1 hour").alias("w60"), "event_type")
        .agg(
            F.sum("sub_n").alias("n_events"),
            # sub_total is an exact decimal-valued double (scale 6); the
            # cast back to DECIMAL recovers it exactly, so the hour sum
            # is order-insensitive like every other money sum here
            F.sum(F.col("sub_total").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("total_value"),
            F.max("sub_total").alias("peak_15m"),
            F.count("*").alias("n_subwindows"),
        )
        .select(
            F.col("w60.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
            "peak_15m",
            "n_subwindows",
        )
    )


def enriched_segment_counts(
    events: DataFrame, dim: DataFrame, watermark: str | None = None
) -> DataFrame:
    """Stream-static enrichment join + windowed aggregate: each event
    joins the (static, broadcast) customer dimension, then rolls up
    per (1-hour window, market segment) — the canonical streaming
    enrichment topology. The static side needs no watermark and holds
    no state: every micro-batch probes the same broadcast table, so
    the only streaming state is the downstream window aggregate's."""
    e = _maybe_watermark(events, watermark)
    d = F.broadcast(dim.select("c_custkey", "c_mktsegment"))
    return (
        e.join(d, e.user_id == d.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "total_value",
        )
    )
