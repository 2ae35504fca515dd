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
    """The driver verifies ~the first 50 presentation entries. The
    prefix must (a) lead with this round's fixes, (b) re-present the
    rows-only entries whose ledger still shows `no_oracle` errors, and
    (c) fill the rest with SQL-oracled queries the driver has never
    checked — re-verifying known greens wastes the bounded correctness
    window (VERDICT r3 item 1)."""
    from local_etl_spark import registry

    registry._load_all_modules()
    order = registry._presentation_order()
    assert len(order) == len(registry.REGISTRY)
    assert len(set(order)) == len(order)
    prefix = order[:50]
    head = list(registry.FIXED_THIS_ROUND) + list(registry.ROWS_ONLY_REPRESENT)
    assert list(prefix[: len(head)]) == [n for n in head if n in registry.REGISTRY]
    # everything after the explicit head is SQL-oracled, never-checked
    tail = prefix[len(head):]
    assert all(registry.REGISTRY[n].oracle for n in tail)
    fresh = [n for n in tail if n not in registry.DRIVER_CHECKED]
    assert len(fresh) >= 40, f"only {len(fresh)} never-checked in prefix"
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
