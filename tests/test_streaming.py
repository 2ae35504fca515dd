"""Structured Streaming ≡ batch for the shared core transforms.

Feeds sf0.001 events through a file JSON source in ts-ordered chunks
(one micro-batch per file via maxFilesPerTrigger) and asserts every
core transform converges to its batch answer — the same functions the
DuckDB oracle checks in batch mode (queries/streaming.py).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from local_etl_spark.catalog import table
from local_etl_spark.streaming import core

SF = "/root/testdata/sf0.001"
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write_chunks(spark, tmp_path, n_chunks=3):
    """events → n ts-ordered JSONL chunk files with increasing mtimes."""
    rows = (
        table(spark, SF, "events")
        .select(
            "event_id",
            F.date_format("ts", TS_FMT).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    src = tmp_path / "stream_src"
    src.mkdir()
    per = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        p = src / f"chunk{i}.json"
        with open(p, "w") as f:
            for r in rows[i * per : (i + 1) * per]:
                f.write(json.dumps(r.asDict()) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src)


def _read_stream(spark, src):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )


def _batch_events(spark, src):
    return (
        spark.read.schema(EVENT_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .json(src)
    )


def _run_to_memory(sdf, name, tmp_path, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _canon(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    return _write_chunks(spark, tmp_path_factory.mktemp("stream"))


@pytest.mark.parametrize(
    "fn,mode",
    [
        (core.tumbling_counts, "complete"),
        (core.sliding_counts, "complete"),
        (core.session_aggregate, "complete"),
        (core.session_aggregate_dynamic, "complete"),
        (core.dedup_events, "append"),
        # stream-stream interval join: watermark (2h) >= lookback (1h),
        # so no match is evicted before pairing — append output equals
        # the batch interval join exactly
        (core.click_attribution, "append"),
        # left-semi stream-stream join: purchase emitted at most once on
        # first qualifying click; same watermark >= lookback contract
        (core.attributed_purchases, "append"),
    ],
    ids=["tumbling", "sliding", "session", "session_dyn", "dedup", "ss_join", "ss_semi"],
)
def test_stream_equals_batch(spark, src, tmp_path, fn, mode):
    name = f"mem_{fn.__name__}"
    _run_to_memory(fn(_read_stream(spark, src)), name, tmp_path, mode)
    got = _canon(spark.table(name))
    want = _canon(fn(_batch_events(spark, src)))
    assert got == want


def test_stateful_totals_converge_to_batch(spark, src, tmp_path):
    """applyInPandasWithState emits running totals per micro-batch; the
    LAST emission per user must equal the batch groupBy (float
    tolerance: pandas accumulates in arrival order, batch in decimal)."""
    _run_to_memory(
        core.user_totals(_read_stream(spark, src)),
        "mem_stateful",
        tmp_path,
        "update",
    )
    # memory sink in update mode appends every emission; the state is
    # monotone (counts only grow), so max(n_events) picks the final one
    final = {}
    for r in spark.table("mem_stateful").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in core.user_totals(_batch_events(spark, src)).collect()
    }
    assert set(final) == set(want)
    for uid, (n, tot) in want.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - tot) < 1e-6 * max(1.0, abs(tot))


def test_watermark_drops_late_rows(spark, tmp_path):
    """Real withWatermark vs the batch emulation (core.late_data_filter).

    Spark's watermark guarantee is one-directional: data within the
    delay is never dropped; data behind it MAY survive while its window
    state is still live. So the late row here arrives only after a
    whole day of event time has passed and the window state is evicted
    — the deterministic drop case both modes must agree on. A final
    far-future row flushes the watermark so real windows close in
    append mode.
    """
    chunks = [
        [
            (0, "2024-01-01 01:02:00.000000", 1, "click", 1.0, "{}"),
            (1, "2024-01-01 03:05:00.000000", 1, "click", 1.0, "{}"),
        ],
        [(2, "2024-01-02 00:00:00.000000", 1, "advance", 1.0, "{}")],
        [(3, "2024-01-01 01:30:00.000000", 1, "click", 7.0, "{}")],  # late
        [(4, "2024-01-03 12:00:00.000000", 9, "flush", 0.0, "{}")],
    ]
    src = tmp_path / "late_src"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate(chunks):
        p = src / f"c{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(cols, r))) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    _run_to_memory(
        core.watermarked_tumbling(_read_stream(spark, str(src))),
        "mem_wm",
        tmp_path,
        "append",
    )
    got = {tuple(r) for r in spark.table("mem_wm").collect()}

    batch = core.watermarked_tumbling(_batch_events(spark, str(src)))
    flush_cut = F.lit("2024-01-03").cast("timestamp")
    want = {tuple(r) for r in batch.filter(F.col("win_start") < flush_cut).collect()}
    assert got == want
    # the late 01:30 row must NOT appear: hour-1 window keeps count 1
    assert (
        sum(r[2] for r in got if r[0].hour == 1 and r[1] == "click") == 1
    )


def test_outer_join_equals_batch(spark, tmp_path):
    """Left-outer stream-stream join: matched rows emit like the inner
    join; NULL-extended rows emit only after both watermarks pass the
    purchase's match horizon. A far-future purchase+click pair flushes
    the watermarks; up to that cutoff the append-mode output must equal
    the batch left-outer join exactly."""
    chunks = [
        [
            (0, "2024-01-01 01:00:00.000000", 1, "click", 1.0, "{}"),
            (1, "2024-01-01 01:30:00.000000", 1, "purchase", 5.0, "{}"),
            (2, "2024-01-01 02:00:00.000000", 2, "purchase", 7.0, "{}"),  # no click
        ],
        [
            (3, "2024-01-01 03:00:00.000000", 2, "click", 1.0, "{}"),
            (4, "2024-01-01 03:10:00.000000", 2, "purchase", 9.0, "{}"),  # attributed to 3
        ],
        [
            (5, "2024-01-05 00:00:00.000000", 9, "purchase", 0.0, "{}"),  # flush
            (6, "2024-01-05 00:00:01.000000", 9, "click", 0.0, "{}"),
        ],
    ]
    src = tmp_path / "outer_src"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate(chunks):
        p = src / f"c{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(cols, r))) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    _run_to_memory(
        core.click_attribution_outer(_read_stream(spark, str(src))),
        "mem_outer",
        tmp_path,
        "append",
    )
    cut = F.lit("2024-01-04").cast("timestamp")
    got = _canon(spark.table("mem_outer").filter(F.col("purchase_ts") < cut))
    want = _canon(
        core.click_attribution_outer(_batch_events(spark, str(src))).filter(
            F.col("purchase_ts") < cut
        )
    )
    assert got == want
    # the unconverted purchase really is null-extended, not dropped,
    # and the late-window purchase 4 matched click 3 (in its lookback)
    rows = spark.table("mem_outer").collect()
    nulls = {r["purchase_id"] for r in rows if r["click_id"] is None}
    assert 2 in nulls
    assert {r["click_id"] for r in rows if r["purchase_id"] == 4} == {3}


def test_tws_totals_or_documented_gap(spark, src, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API v2): runs the
    stream-vs-batch convergence check when google.protobuf is
    available; in this container (no protobuf, no network) it instead
    pins the exact documented failure so the gap stays visible and the
    gate self-removes once the dependency exists."""
    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises(StreamingQueryException, match="driver worker exited"):
            _run_to_memory(
                core.user_totals_tws(_read_stream(spark, src)),
                "mem_tws_gap",
                tmp_path,
                "update",
            )
        return

    _run_to_memory(
        core.user_totals_tws(_read_stream(spark, src)),
        "mem_tws",
        tmp_path,
        "update",
    )
    final = {}
    for r in spark.table("mem_tws").collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in core.user_totals(_batch_events(spark, src)).collect()
    }
    # integer-cents accumulator: exact equality, no float tolerance
    assert final == {u: (n, round(t, 2)) for u, (n, t) in want.items()}


def test_full_outer_join_equals_batch(spark, tmp_path):
    """Full-outer stream-stream join: matched rows emit like the inner
    join; null-extended rows on EITHER side (unconverted purchase /
    purchase-less click) emit only after both watermarks pass that
    row's match horizon. Flush rows on both sides push the horizons;
    up to the cutoff the append output must equal the batch FULL JOIN."""
    chunks = [
        [
            (0, "2024-01-01 01:00:00.000000", 1, "click", 1.0, "{}"),
            (1, "2024-01-01 01:30:00.000000", 1, "purchase", 5.0, "{}"),  # matched
            (2, "2024-01-01 02:00:00.000000", 2, "purchase", 7.0, "{}"),  # no click
            (3, "2024-01-01 02:30:00.000000", 3, "click", 1.0, "{}"),  # no purchase
        ],
        [
            (4, "2024-01-01 03:00:00.000000", 2, "click", 1.0, "{}"),  # after 2: no match
            (5, "2024-01-01 03:10:00.000000", 2, "purchase", 9.0, "{}"),  # matches 4
        ],
        [
            (6, "2024-01-05 00:00:00.000000", 9, "purchase", 0.0, "{}"),  # flush
            (7, "2024-01-05 00:00:01.000000", 9, "click", 0.0, "{}"),
        ],
    ]
    src = tmp_path / "fo_src"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate(chunks):
        p = src / f"c{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(cols, r))) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    _run_to_memory(
        core.click_attribution_full(_read_stream(spark, str(src))),
        "mem_full_outer",
        tmp_path,
        "append",
    )
    cut = F.lit("2024-01-04").cast("timestamp")
    pre = F.coalesce(F.col("purchase_ts"), F.col("click_ts")) < cut
    got = _canon(spark.table("mem_full_outer").filter(pre))
    want = _canon(
        core.click_attribution_full(_batch_events(spark, str(src))).filter(pre)
    )
    assert got == want
    rows = spark.table("mem_full_outer").collect()
    # unconverted purchase null-extended on the click side...
    assert 2 in {r["purchase_id"] for r in rows if r["click_id"] is None}
    # ...AND the purchase-less click null-extended on the purchase side
    assert 3 in {r["click_id"] for r in rows if r["purchase_id"] is None}
    # click 4 attributed to purchase 5 (within lookback)
    assert {r["click_id"] for r in rows if r["purchase_id"] == 5} == {4}


def test_chained_agg_stream_equals_batch(spark, src, tmp_path):
    """Two chained stateful window aggregations in one streaming query
    (15-min tumbling → 1-hour re-agg). Append mode emits an hour window
    once the watermark passes its end; on a ts-ordered replay nothing
    is late, so the emitted set must equal the batch answer restricted
    to finalized windows. Compare on a horizon safely behind the final
    watermark to avoid boundary ambiguity."""
    _run_to_memory(
        core.chained_window_agg(_read_stream(spark, src), watermark="10 minutes"),
        "mem_chained",
        tmp_path,
        "append",
    )
    batch = core.chained_window_agg(_batch_events(spark, src))
    max_ts = _batch_events(spark, src).agg(F.max("ts")).collect()[0][0]
    horizon = F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    got = _canon(spark.table("mem_chained").filter(F.col("win_start") < horizon))
    want = _canon(batch.filter(F.col("win_start") < horizon))
    assert len(want) > 10
    assert got == want
    # everything the stream emitted agrees with batch (no extras)
    assert set(_canon(spark.table("mem_chained"))) <= set(_canon(batch))


def test_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """Stop a streaming query mid-stream, add data, restart from the
    SAME checkpoint into the same FILE sink: the checkpointed source
    offsets must resume exactly after the consumed chunks (no
    reprocessing, no gaps — the parquet sink's transaction log makes
    duplicates visible), recovered state must keep deduplicating
    across the restart, and the final sink contents must equal the
    batch answer. This is the recovery contract a production
    deployment leans on."""
    chunks = [
        [(0, "2024-01-01 01:00:00.000000", 1, "click", 1.0, "{}"),
         (1, "2024-01-01 01:30:00.000000", 1, "view", 2.0, "{}")],
        [(2, "2024-01-01 02:10:00.000000", 2, "click", 3.0, "{}")],
        [(3, "2024-01-01 03:20:00.000000", 1, "click", 5.0, "{}"),
         (4, "2024-01-05 00:00:00.000000", 9, "view", 0.0, "{}")],  # flush
    ]
    src = tmp_path / "ckpt_src"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write_chunk(i):
        p = src / f"c{i}.json"
        with open(p, "w") as f:
            for r in chunks[i]:
                f.write(json.dumps(dict(zip(cols, r))) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    ckpt = str(tmp_path / "ckpt_dir")
    sink = str(tmp_path / "ckpt_sink")

    def start():
        return (
            core.dedup_events(_read_stream(spark, str(src)), watermark="1 hour")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    write_chunk(0)
    write_chunk(1)
    q = start()
    q.processAllAvailable()
    q.stop()
    first = set(_canon(spark.read.parquet(sink)))
    assert len(first) == 3  # events 0,1,2 all first-of-key

    write_chunk(2)
    q2 = start()  # SAME checkpoint, SAME sink
    q2.processAllAvailable()
    q2.stop()
    total = set(_canon(spark.read.parquet(sink)))

    # resumed run appended ONLY post-checkpoint results (no
    # reprocessing of chunks 0-1 — counts would double otherwise)
    rows = spark.read.parquet(sink).count()
    assert rows == len(total)  # no duplicate rows at all
    assert first <= total
    # the union equals the batch answer over everything: stateful dedup
    # across restart — event 3 is user 1's second click; state recovered
    # from the checkpoint must suppress it
    want = set(_canon(core.dedup_events(_batch_events(spark, str(src)))))
    assert total == want
    assert len(total - first) == 1  # only the flush-row view is new


def test_stream_static_join_equals_batch(spark, src, tmp_path):
    """Stream-static enrichment: the broadcast customer dimension is
    probed by every micro-batch with no state on the static side, and
    the windowed segment rollup converges to the batch answer."""
    dim = table(spark, SF, "customer")
    _run_to_memory(
        core.enriched_segment_counts(_read_stream(spark, src), dim),
        "mem_static_join",
        tmp_path,
        "complete",
    )
    got = _canon(spark.table("mem_static_join"))
    want = _canon(core.enriched_segment_counts(_batch_events(spark, src), dim))
    assert got == want


def test_dedup_within_watermark_evicts_and_reemits(spark, tmp_path):
    """dropDuplicatesWithinWatermark's two-sided contract: a duplicate
    key arriving while its state is live (within the 30-min delay) is
    DROPPED; once the watermark passes the key's event time + delay
    the state is evicted and a later re-occurrence RE-EMITS — the
    bounded-state trade plain dropDuplicates (stream_dedup) never
    makes. Chunks arrive in separate micro-batches (maxFilesPerTrigger
    1) so the watermark advances between them. Eviction LAGS the
    watermark by one micro-batch (state cleanup runs at end-of-batch,
    AFTER that batch's dedup — measured: a re-occurrence in the same
    batch that first runs under the advanced watermark is still
    dropped), hence the extra advancing chunk before the
    re-occurrence."""
    chunks = [
        [(0, "2024-01-01 01:00:00.000000", 1, "click", 1.0, "{}")],
        # same key 10 min later: inside the delay → dropped
        [(1, "2024-01-01 01:10:00.000000", 1, "click", 2.0, "{}")],
        # other key far ahead: watermark → 04:30 after this batch
        [(2, "2024-01-01 05:00:00.000000", 9, "advance", 1.0, "{}")],
        # one batch under the advanced watermark: end-of-batch cleanup
        # evicts u1-click (expiry 01:40 < 04:30)
        [(3, "2024-01-01 05:30:00.000000", 9, "advance", 2.0, "{}")],
        # same key again, after eviction → re-emits
        [(4, "2024-01-01 06:00:00.000000", 1, "click", 3.0, "{}")],
    ]
    src = tmp_path / "wmdd_src"
    src.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, rows in enumerate(chunks):
        p = src / f"c{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(cols, r))) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    _run_to_memory(
        core.dedup_events_within_watermark(_read_stream(spark, str(src))),
        "mem_wmdd",
        tmp_path,
        "append",
    )
    got = {r["event_id"] for r in spark.table("mem_wmdd").collect()}
    # 1 dropped as dup; 3 dropped (dup of the live u9-advance state);
    # 4 re-emitted after eviction
    assert got == {0, 2, 4}
