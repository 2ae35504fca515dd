"""CLI shim unit tests (no SparkSession needed)."""

from __future__ import annotations

from local_etl_spark.__main__ import format_duration


def test_format_duration_seconds_only():
    assert format_duration(12.606) == "12.61 second(s)"


def test_format_duration_drops_leading_zero_units():
    assert format_duration(3600 + 62.5) == (
        "1 hour(s), 1 minute(s), 2.50 second(s)"
    )


def test_format_duration_full_units():
    assert format_duration(2 * 86400 + 3 * 3600 + 4 * 60 + 5) == (
        "2 day(s), 3 hour(s), 4 minute(s), 5.00 second(s)"
    )


def test_presentation_prefix_prioritizes_unverified():
    """The driver verifies the first DRIVER_PREFIX presentation entries.
    The prefix must (a) lead with this round's fixes, (b) fill with
    SQL-oracled queries the driver has never checked (priority families
    whole — VERDICT r5 #2 wants the sql family closed out), and (c)
    spend the TAIL on rows-only re-presents so each gets a driver
    spark_rows record (VERDICT r5 #3) — re-verifying known greens
    wastes the bounded correctness window (VERDICT r3 item 1)."""
    from local_etl_spark import registry

    registry._load_all_modules()
    order = registry._presentation_order()
    assert len(order) == len(registry.REGISTRY)
    assert len(set(order)) == len(order)
    prefix = order[: registry.DRIVER_PREFIX]
    fixed = [n for n in registry.FIXED_THIS_ROUND if n in registry.REGISTRY]
    represent = [
        n for n in registry.ROWS_ONLY_REPRESENT if n in registry.REGISTRY
    ]
    assert prefix[: len(fixed)] == fixed
    # rows-only re-presents are contiguous in the prefix, immediately
    # after the fresh block (round 8: the fresh queue no longer fills
    # head_len, so rechecks pad the literal tail — the contract is
    # that every re-present lands IN the prefix, which the driver
    # records regardless of position)
    if represent:
        i = prefix.index(represent[0])
        assert prefix[i : i + len(represent)] == represent
    # everything before the re-presents is SQL-oracled and NEVER
    # driver-checked (the fresh block); rechecks may pad after them
    mid = prefix[len(fixed) : prefix.index(represent[0])] if represent else []
    assert all(registry.REGISTRY[n].oracle for n in mid)
    fresh = [n for n in mid if n not in registry.DRIVER_CHECKED]
    assert len(fresh) == len(mid), "recheck leaked into the fresh block"
    # every never-checked SQL-oracled query must be in the prefix once
    # the fresh queue fits (r8 regime: total external coverage)
    all_fresh = [
        n for n, s in registry.REGISTRY.items()
        if s.oracle and n not in registry.DRIVER_CHECKED
    ]
    if len(all_fresh) + len(fixed) + len(represent) <= registry.DRIVER_PREFIX:
        assert set(all_fresh) <= set(prefix), "fresh query missed the prefix"
    else:
        assert len(fresh) >= 40, f"only {len(fresh)} never-checked in prefix"
    # priority families are exhausted before any other fresh entry
    for fam in registry._PRIORITY_FAMILIES:
        fam_fresh_all = [
            n for n, s in registry.REGISTRY.items()
            if s.oracle and s.family == fam and n not in registry.DRIVER_CHECKED
        ]
        assert set(fam_fresh_all) <= set(mid), f"{fam} not closed out"
    # remaining rows-only entries must come last
    rows_only_tail = [
        n for n in order
        if not registry.REGISTRY[n].oracle and n not in registry.ROWS_ONLY_REPRESENT
    ]
    first = order.index(rows_only_tail[0])
    assert all(not registry.REGISTRY[n].oracle for n in order[first:])


def test_cli_query_runner(spark, capsys):
    """--query list enumerates the registry; --query NAME runs it."""
    from local_etl_spark.__main__ import main

    assert main(["--query", "list"]) == 0
    out = capsys.readouterr().out
    assert "agg_groupby" in out and out.count("\n") >= 240

    assert main(
        ["--query", "agg_global", "--sf-dir", "/root/testdata/sf0.001"]
    ) == 0
    out = capsys.readouterr().out
    assert "Elapsed:" in out

    assert main(["--query", "definitely_not_a_query"]) == 2


def test_query_collects_stay_driver_sized(spark):
    """Driver-boundedness guard (VERDICT r9 #9): every .collect() a
    query fn makes while BUILDING its DataFrame must stay model-sized
    (query vectors, trained codebooks, manifests) — never
    corpus-proportional. Discovers the collecting ops from their own
    source, runs each at sf0.01 with the classic DataFrame's collect
    wrapped (the pyspark.sql.DataFrame base is abstract in Spark 4 —
    patching it misses the subclass override), and asserts every
    internal collect returns <= the declared bound. tools_driver_sim
    applies the same guard to ALL ops at every sim SF, so a future
    op with a new collect is caught there each round even if its
    collect hides in a helper this source scan can't see."""
    import inspect

    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from local_etl_spark import registry

    registry._load_all_modules()
    BOUND = 25_000
    # ops whose collect hides in a shared helper the per-fn source
    # scan can't see (the sim-level guard still covers them at all SFs)
    helper_collectors = {"llm_kmeans_train"}
    collectors = [
        (name, spec)
        for name, spec in registry.REGISTRY.items()
        if ".collect(" in inspect.getsource(spec.fn)
        or name in helper_collectors
    ]
    # the known-collector families must be discovered (the scan going
    # silently empty would neuter the guard)
    found = {n for n, _ in collectors}
    assert {"llm_simsearch_ivf", "llm_kmeans_train", "llm_simsearch_pq"} <= found

    sizes: dict[str, int] = {}
    orig = CDF.collect
    cur = [None]

    def wrapped(self):
        rows = orig(self)
        if cur[0] is not None:
            sizes[cur[0]] = max(sizes.get(cur[0], 0), len(rows))
        return rows

    CDF.collect = wrapped
    try:
        for name, spec in collectors:
            cur[0] = name
            spec.fn(spark, "/root/testdata/sf0.01")
            cur[0] = None
    finally:
        CDF.collect = orig
    over = {n: v for n, v in sizes.items() if v > BOUND}
    assert not over, f"driver over-collects at sf0.01: {over}"
