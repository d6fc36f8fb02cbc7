"""Query registry — the driver contract surface.

Every implemented operator registers a named query
``fn(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. ``__spark_entry__.py``
is a thin adapter over this registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    from streamforge_spark.queries import (  # noqa: F401
        cdc, streamops, joins, sessions, tpch, text, embeddings, llm,
        surplus, envelope_io, analytics, relational, windows, curation,
        repetition, timeseries, graphs, sketches, release, simjoin,
        stats,
    )
