"""Driver-shaped correctness gate: every registered query vs its DuckDB
oracle at sf0.001 (fast) — exactly the comparison the driver runs at
sf0.01. Set STREAMFORGE_PARITY_SF=/root/testdata/sf0.01 to run the
full-size check locally."""

from __future__ import annotations

import os

import pytest

from streamforge_spark import registry
from tests.oracle import compare, duck_con

registry.load_all()

SF_DIR = os.environ.get("STREAMFORGE_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_parity(spark, con, name):
    spark_df = registry.QUERIES[name](spark, SF_DIR).toPandas()
    oracle_df = con.sql(registry.ORACLES[name]).df()
    compare(spark_df, oracle_df, name)


def test_all_queries_run(spark):
    """Queries without oracles still must execute and return a schema."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
