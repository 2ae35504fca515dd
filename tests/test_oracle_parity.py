"""Every registered query with an oracle must hash-match DuckDB.

Runs at sf0.001 for speed (the driver runs sf0.01; same semantics).
Set LOCAL_ETL_ORACLE_SF=/root/testdata/sf0.01 to run the driver's scale.
"""

from __future__ import annotations

import os

import pytest

from local_etl_spark import registry
from tests.oracle import assert_oracle_match

SF_DIR = os.environ.get("LOCAL_ETL_ORACLE_SF", "/root/testdata/sf0.001")

registry._load_all_modules()
SPECS = [s for s in registry.REGISTRY.values() if s.oracle]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec):
    assert_oracle_match(spark, spec, SF_DIR)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


def test_registry_contract(spark):
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())


def test_oracle_type_sweep():
    """DESCRIBE every oracle and reject result types the driver's pandas
    canonicalizer diverges on: TIMESTAMP WITH TIME ZONE (tz-aware
    datetime64 vs Spark's naive timestamp → schema mismatch), HUGEINT
    (→ float64 → `5.0` vs `5` hash mismatch), DECIMAL (same float64
    rendering problem). r2 shipped 7 such oracles; this sweep catches
    the class before the driver does. Pure DuckDB — no Spark needed."""
    from tests.oracle import duck_connect

    banned = ("TIMESTAMP WITH TIME ZONE", "HUGEINT", "DECIMAL", "UHUGEINT")
    con = duck_connect(SF_DIR)
    try:
        offenders = []
        for spec in SPECS:
            rows = con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
            for col, coltype, *_ in rows:
                if any(b in coltype.upper() for b in banned):
                    offenders.append(f"{spec.name}.{col}: {coltype}")
        assert not offenders, (
            "oracle result types the driver canon diverges on "
            f"(CAST them to TIMESTAMP/BIGINT/DOUBLE): {offenders}"
        )
    finally:
        con.close()


def test_oracle_type_sweep_detects_r2_bug_classes():
    """Negative control: the sweep's DESCRIBE check must flag each of
    the exact SQL shapes that caused the r2 driver failures — an
    un-cast to_timestamp (TIMESTAMPTZ), a bare integer sum (HUGEINT),
    and a bare decimal-literal CASE (DECIMAL)."""
    from tests.oracle import duck_connect

    bad = {
        "to_timestamp(42) AS w": "TIMESTAMP WITH TIME ZONE",
        "sum(x) AS s": "HUGEINT",
        "CASE WHEN x = 1 THEN 0.5 ELSE 0.25 END AS r": "DECIMAL",
    }
    con = duck_connect(SF_DIR)
    try:
        for expr, expected in bad.items():
            rows = con.execute(
                f"DESCRIBE (SELECT {expr} FROM (SELECT 1 AS x))"
            ).fetchall()
            types = [r[1].upper() for r in rows]
            assert any(expected in t for t in types), (expr, types)
    finally:
        con.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracled_schema_canon_safe(spark, spec):
    """The driver canonicalizes oracled results with pandas sort_values,
    which cannot factorize list/dict cells — any Array/Map-typed column
    in a final oracled schema is therefore a guaranteed driver FAIL even
    when values agree. Schema-only check (no execution)."""
    import pyspark.sql.types as T

    df = spec.fn(spark, SF_DIR)
    offenders = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not offenders, f"{spec.name}: non-scalar result columns {offenders}"
