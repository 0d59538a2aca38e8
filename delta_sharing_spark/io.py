"""Dataset loading helpers for the driver's testdata tables.

One wrinkle: Spark's Parquet reader rejects INT64 TIMESTAMP(NANOS)
(PARQUET_TYPE_ILLEGAL) while the reference stack reads everything through
Arrow, which handles ns natively (python/delta_sharing/converter.py:130-172
maps timestamps to Arrow µs). We match the reference's µs semantics: enable
``spark.sql.legacy.parquet.nanosAsLong`` and rewrite ns-int64 columns to
``timestamp_micros(ns / 1000)``, which floors exactly like DuckDB's and
Arrow's ns->µs cast. Detection is from the Parquet footer (O(KB) per file —
scale-safe).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _ns_timestamp_columns(path: str) -> list[str]:
    """Top-level timestamp[ns] columns, read from one footer."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with ns-timestamp normalization to µs."""
    ns_cols = _ns_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(
            c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
        )
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the testdata tables (TESTDATA.md) by name."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register the testdata tables as temp views for spark.sql queries."""
    for name in names or TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
