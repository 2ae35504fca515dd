"""Streaming-shaped queries, batch-checked (SURVEY.md §2.4-I).

Every query here delegates to local_etl_spark/streaming/core.py — the
same functions run under Structured Streaming in
tests/test_streaming.py. The DuckDB oracles re-derive the window
semantics from first principles (date_trunc, epoch-floor buckets,
lag/gap/cumsum sessionization), so a semantics drift in either
representation breaks parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from local_etl_spark.queries._util import t
from local_etl_spark.queries.windows import SESSION_DYNAMIC_ORACLE
from local_etl_spark.registry import query
from local_etl_spark.streaming import core

_DSUM_SQL = (
    "CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)"
)


def _write_stream_chunks(df: DataFrame, src: str, n_chunks: int = 3) -> None:
    """Materialize ``df`` as ``n_chunks`` ts-ordered JSON files for a
    file-stream replay, EXECUTOR-side.

    ``repartitionByRange`` puts the earliest third of the timeline in
    range bucket 0, etc., and the JSON writer emits one ``part-0000i``
    file per bucket in parallel — the driver never holds the data
    (the previous collect()-and-write-in-Python fixture OOMs the
    driver at 100× scale, VERDICT r3 #3). Only the mtime stamping —
    which is how FileStreamSource orders micro-batches — stays on the
    driver, and that is O(n_chunks).
    """
    import glob as _glob
    import os as _os

    (
        df.repartitionByRange(n_chunks, "ts", "event_id")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .json(src)
    )
    parts = sorted(_glob.glob(_os.path.join(src, "part-*")))
    for i, p in enumerate(parts):
        _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


@query(
    "stream_tumbling",
    family="streaming",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-h tumbling window counts (streaming twin: core.tumbling_counts)."""
    return core.tumbling_counts(t(spark, sf_dir, "events"))


@query(
    "stream_sliding",
    family="streaming",
    oracle=f"""
    -- every event belongs to the 4 epoch-aligned 15-min-sliding 1-h
    -- windows ending after it: starts bucket-45m .. bucket-0m
    -- CAST: DuckDB to_timestamp() is TIMESTAMPTZ; the driver's pandas
    -- canon sees datetime64[us, UTC] vs Spark's naive timestamp.
    SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900
                             - k.k * 900) AS TIMESTAMP) AS win_start,
           count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM events
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-h window sliding 15 min (streaming twin: core.sliding_counts)."""
    return core.sliding_counts(t(spark, sf_dir, "events"))


@query(
    "stream_session",
    family="streaming",
    oracle=f"""
    -- lag/gap/cumsum sessionization: new session when the gap since the
    -- previous event is >= 30 min (Spark merges only on strict overlap)
    WITH g AS (
        SELECT user_id, ts, event_id, value,
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
           min(ts) AS sess_start,
           max(ts) + INTERVAL 30 MINUTE AS sess_end,
           count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM s
    GROUP BY user_id, sess
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap session windows per user (core.session_aggregate)."""
    return core.session_aggregate(t(spark, sf_dir, "events"))


@query(
    "stream_dedup",
    family="streaming",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user_id, event_type) (core.dedup_events)."""
    return core.dedup_events(t(spark, sf_dir, "events"))


@query(
    "stream_dedup_within_wm",
    family="streaming",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def stream_dedup_within_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state dedup (core.dedup_events_within_watermark —
    dropDuplicatesWithinWatermark in streaming mode): same keep-first
    rows on the batch path, but the streaming twin evicts per-key
    state once the watermark passes event time + delay, trading
    unbounded state growth for at-least-once re-emission beyond the
    delay (both halves pinned in tests/test_streaming.py)."""
    return core.dedup_events_within_watermark(t(spark, sf_dir, "events"))


@query(
    "stream_stateful",
    family="streaming",
    oracle=f"""
    SELECT user_id, count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful per-user totals (core.user_totals); the streaming
    twin runs applyInPandasWithState, asserted equal in tests."""
    return core.user_totals(t(spark, sf_dir, "events"))


@query("stream_watermark", family="streaming", oracle=None)
def stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-drop semantics, batch-emulated (rows-only check).

    Not SQL-oracle-able: the drop set depends on arrival order, which
    DuckDB has no notion of. tests/test_streaming.py asserts the real
    ``withWatermark`` stream converges to this answer on an ordered
    replay with injected late rows.
    """
    return core.watermarked_tumbling(t(spark, sf_dir, "events"))


@query(
    "stream_join",
    family="streaming",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    """,
)
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join, batch-checked
    (streaming twin: core.click_attribution under Structured Streaming
    with state-evicting event-time bounds; tests/test_streaming.py)."""
    return core.click_attribution(t(spark, sf_dir, "events"))


@query(
    "stream_semi_join",
    family="streaming",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = p.user_id
          AND c.ts > p.ts - INTERVAL 1 HOUR
          AND c.ts <= p.ts
      )
    """,
)
def stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT SEMI join (converted purchases),
    batch-checked against the decorrelated-EXISTS oracle (streaming
    twin: core.attributed_purchases; tests/test_streaming.py asserts
    stream == batch under append mode)."""
    return core.attributed_purchases(t(spark, sf_dir, "events"))


@query(
    "stream_outer_join",
    family="streaming",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    """,
)
def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join (every
    purchase, attributed or null-extended), batch-checked (streaming
    twin: core.click_attribution_outer; tests/test_streaming.py asserts
    stream == batch up to the flushed watermark horizon)."""
    return core.click_attribution_outer(t(spark, sf_dir, "events"))


@query(
    "stream_full_outer_join",
    family="streaming",
    oracle="""
    SELECT p.purchase_id,
           coalesce(p.user_id, c.user_id) AS user_id,
           p.purchase_ts, c.click_id, c.click_ts
    FROM (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT event_id AS click_id, user_id, ts AS click_ts
               FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.click_ts > p.purchase_ts - INTERVAL 1 HOUR
     AND c.click_ts <= p.purchase_ts
    """,
)
def stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream FULL OUTER interval join (matched
    attributions + unconverted purchases + purchase-less clicks in one
    result), batch-checked against the equivalent FULL JOIN (streaming
    twin: core.click_attribution_full; tests/test_streaming.py asserts
    stream == batch up to both flushed watermark horizons)."""
    return core.click_attribution_full(t(spark, sf_dir, "events"))


@query(
    "stream_chained_agg",
    family="streaming",
    oracle=f"""
    WITH sub AS (
        -- CAST: DuckDB to_timestamp() is TIMESTAMPTZ (driver schema
        -- mismatch vs Spark's naive timestamp)
        SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900)
                    AS TIMESTAMP) AS w15,
               event_type,
               {_DSUM_SQL} AS sub_total,
               count(*) AS sub_n
        FROM events
        GROUP BY 1, 2
    )
    SELECT CAST(to_timestamp(floor(epoch(w15) / 3600) * 3600)
                AS TIMESTAMP) AS win_start,
           event_type,
           CAST(sum(sub_n) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(sub_total AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS total_value,
           max(sub_total) AS peak_15m,
           count(*) AS n_subwindows
    FROM sub
    GROUP BY 1, 2
    """,
)
def stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful windowed aggregations in one query — 15-min
    tumbling sums re-aggregated into 1-hour windows with peak sub-window
    load (Spark 3.4+ chained time-window aggregation; streaming twin:
    core.chained_window_agg, asserted stream == batch in
    tests/test_streaming.py). The DuckDB oracle re-derives both window
    levels from epoch-floor buckets."""
    return core.chained_window_agg(t(spark, sf_dir, "events"))


@query(
    "stream_static_join",
    family="streaming",
    oracle=f"""
    SELECT date_trunc('hour', e.ts) AS win_start,
           c.c_mktsegment AS segment,
           count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: events probe the broadcast
    customer dimension (no state, no watermark on the static side),
    rolled up per (1-hour window, market segment) — the canonical
    streaming enrichment topology (streaming twin:
    core.enriched_segment_counts; tests/test_streaming.py asserts
    stream == batch in complete mode)."""
    return core.enriched_segment_counts(
        t(spark, sf_dir, "events"), t(spark, sf_dir, "customer")
    )


@query(
    "stream_foreach_merge",
    family="streaming",
    oracle=f"""
    SELECT user_id, count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_foreach_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch keyed merge — the standard streaming-upsert
    topology (Structured Streaming's answer to MERGE INTO a keyed
    store): each micro-batch pre-aggregates per user, then merges into
    a versioned parquet state via union + re-aggregate, so the sink
    holds exactly one row per key after every batch. Unlike the other
    stream_* entries (batch twins of streaming cores), this one RUNS
    the real stream: events replay as ts-ordered file chunks with
    maxFilesPerTrigger=1, and the returned DataFrame is the final
    merged state. It is still SQL-oracled because the state keeps
    EXACT DECIMAL totals — decimal addition is associative across any
    batch slicing, so the final state equals the one-shot batch
    aggregate bit-for-bit (cast to DOUBLE only at the edge).

    Scale: each merge shuffles (prev_state ∪ batch_agg) on the key —
    state-sized, not stream-sized; versioned state dirs give
    atomic-rename isolation (readers never see a half-written merge).
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from local_etl_spark.queries._util import dec

    base = _os.path.join(
        "/tmp",
        "local_etl_spark_scan_cache",
        _os.path.basename(_os.path.normpath(sf_dir)) or "sf",
        "foreach_merge",
    )
    src = _os.path.join(base, "src")
    state_root = _os.path.join(base, "state")
    ckpt = _os.path.join(base, "ckpt")
    for d in (src, state_root, ckpt):
        _shutil.rmtree(d, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "value",
    )
    _write_stream_chunks(ev, src)

    schema = "event_id BIGINT, ts STRING, user_id BIGINT, value DOUBLE"

    def merge(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("decimal(28,6)").alias("total_dec"),
        )
        versions = sorted(_glob.glob(_os.path.join(state_root, "v*")))
        if versions:
            prev = batch_df.sparkSession.read.parquet(versions[-1])
            agg = (
                prev.unionByName(agg)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_dec").cast("decimal(28,6)").alias("total_dec"),
                )
            )
        agg.write.mode("overwrite").parquet(
            _os.path.join(state_root, f"v{batch_id:05d}")
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = sorted(_glob.glob(_os.path.join(state_root, "v*")))[-1]
    return spark.read.parquet(final).select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_dec").cast("double").alias("total_value"),
    )


@query(
    "stream_trigger_availablenow",
    family="streaming",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n_events, {_DSUM_SQL} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_trigger_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow batch-drain: the production pattern for
    INCREMENTAL BATCH jobs — the stream starts, processes everything
    currently available in bounded micro-batches, commits the
    checkpoint, and STOPS (unlike processAllAvailable, which is a test
    utility on a still-running query; unlike continuous triggers, no
    idle cluster). Runs the real stream over ts-ordered file chunks
    into a memory sink in complete mode; the drained result must equal
    the batch windowed aggregate, which is exactly what the oracle
    recomputes. Scale: each micro-batch is source-rate-limited
    (maxFilesPerTrigger), so the drain never builds an unbounded batch
    — the property that makes AvailableNow safe on a backlog.
    """
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    base = _os.path.join(
        "/tmp",
        "local_etl_spark_scan_cache",
        _os.path.basename(_os.path.normpath(sf_dir)) or "sf",
        "availablenow",
    )
    src, ckpt = _os.path.join(base, "src"), _os.path.join(base, "ckpt")
    for d in (src, ckpt):
        _shutil.rmtree(d, ignore_errors=True)
    _write_stream_chunks(
        t(spark, sf_dir, "events").select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "event_type",
            "value",
        ),
        src,
    )
    schema = "event_id BIGINT, ts STRING, event_type STRING, value DOUBLE"
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    agg = core.tumbling_counts(sdf)
    name = "mem_availablenow"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)  # AvailableNow stops ITSELF after the drain
    return spark.table(name)


@query(
    "stream_session_dynamic",
    family="streaming",
    # shared verbatim with win_session_dynamic (ADVICE r5 — one
    # definition, one pair of gap constants in streaming.core)
    oracle=SESSION_DYNAMIC_ORACLE,
)
def stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessions (core.session_aggregate_dynamic): the
    streaming-capable twin of win_session_dynamic — same session_window
    aggregation, written once, run here in batch for the oracle check
    and replayed as a real file-source stream in
    tests/test_streaming.py, which asserts the drained stream equals
    this batch answer exactly (session-merging state across
    micro-batches)."""
    return core.session_aggregate_dynamic(t(spark, sf_dir, "events"))
