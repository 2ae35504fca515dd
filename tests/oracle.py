"""DuckDB oracle harness mirroring the driver's correctness check:
row-count + schema-width + order-insensitive canonicalized value compare.

Columns are sorted by name before comparison (the driver does the same),
so Spark/SQL alias parity is exercised exactly as it will be graded.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, Decimal):
        # The driver's pandas canon renders DECIMAL as float64 (`5.0`)
        # where Spark emits int/exact repr — an oracle emitting DECIMAL
        # is a typing bug; fail here instead of masking it.
        raise AssertionError(
            f"oracle emitted DECIMAL cell {v!r} — CAST the oracle column "
            "to DOUBLE/BIGINT (driver pandas canon diverges on DECIMAL)"
        )
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # DuckDB TIMESTAMPTZ → pandas datetime64[us, UTC] → driver
            # schema mismatch vs Spark's naive timestamp. Fail loudly.
            raise AssertionError(
                f"oracle emitted tz-aware timestamp {v!r} — CAST(... AS "
                "TIMESTAMP) in the oracle (driver sees a schema mismatch)"
            )
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_canon_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def assert_oracle_match(spark, spec, sf_dir: str) -> None:
    """Run spec.fn on Spark and spec.oracle on DuckDB; compare."""
    sdf = spec.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    try:
        res = con.execute(spec.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch; first diffs (spark vs duck): {diffs}"
        )
