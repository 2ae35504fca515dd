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
