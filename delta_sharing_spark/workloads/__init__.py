"""Workload registry: named queries with DuckDB oracle twins.

Each workload is a callable ``(spark, sf_dir) -> DataFrame`` registered with
an optional ANSI-SQL oracle string that DuckDB runs over the same parquet
tables. The driver's correctness gate compares the two (row count + schema +
order-insensitive value hash), so every computed column is aliased
identically on both sides, and float-sensitive aggregates go through exact
DECIMAL arithmetic with a final CAST TO DOUBLE (bit-identical in Spark and
DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def workload(name: str, oracle: str | None = None):
    """Register a workload; ``oracle=None`` marks a non-SQL-expressible op
    (the driver records a weaker rows-only check for those)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all workload modules so their registrations run."""
    from delta_sharing_spark.workloads import (  # noqa: F401
        advanced,
        dedup,
        engine,
        relational,
        sampling,
        similarity,
        streaming,
        text,
        tpch,
    )
