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
