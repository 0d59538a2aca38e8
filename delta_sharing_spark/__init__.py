"""delta_sharing_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of delta-io/delta-sharing.

The reference (v1.1.0) is a REST protocol + server/client stack whose "query
engine" is a metadata engine: catalog listing, snapshot resolution / time
travel, file-level predicate pruning (partition values + min/max stats),
best-effort limit, change-data-feed reconstruction, and streaming admission
control (see SURVEY.md). Row-level relational compute is delegated to the
host engine.

This package re-expresses that engine Spark-first:

- ``ShareCatalog``      — Share/Schema/Table namespace + pagination
                          (ref server/.../SharedTableManager.scala).
- ``TableLog``          — versioned commit log of add/remove/cdc actions over
                          Parquet, with per-file stats from Parquet footers
                          (ref PROTOCOL.md action model).
- ``SharedTable``       — snapshot(version|timestamp) -> DataFrame with
                          partition pruning, stats-based file skipping
                          (3-valued Unknown logic), and limit-hint early
                          termination (ref server/.../DeltaSharedTable.scala).
- ``table_changes``     — CDF DataFrame with _change_type/_commit_version/
                          _commit_timestamp (ref DeltaSharingCDCReader.scala).
- streaming source      — micro-batch admission control
                          (maxFilesPerTrigger/maxBytesPerTrigger) over the
                          commit log (ref client/.../DeltaSharingSource.scala).
- ``operators``/``functions`` — the large-scale training-data pipeline layer
                          (dedup, similarity search, text analysis, multimodal
                          column plumbing) built on DataFrame primitives.

Everything row-level rides on Spark SQL / Catalyst: joins, aggregation,
windows, sorts, and scalar functions are deliberately NOT reimplemented
(SURVEY.md §2.6).
"""

from delta_sharing_spark.catalog import Schema, Share, ShareCatalog, Table
from delta_sharing_spark.client import (
    SharingClient,
    get_last_transaction,
    get_table_metadata,
    get_table_protocol,
    get_table_txns,
    get_table_version,
    load_as_arrow,
    load_as_pandas,
    load_as_spark,
    load_table_changes_as_pandas,
    load_table_changes_as_spark,
)
from delta_sharing_spark.session import get_spark
from delta_sharing_spark.table import SharedTable

__version__ = "0.1.0"

# the reference connector's public surface (python/delta_sharing/__init__.py)
# plus the engine-side entry points
__all__ = [
    "Schema",
    "Share",
    "ShareCatalog",
    "SharedTable",
    "SharingClient",
    "Table",
    "get_spark",
    "get_last_transaction",
    "get_table_metadata",
    "get_table_protocol",
    "get_table_txns",
    "get_table_version",
    "load_as_arrow",
    "load_as_pandas",
    "load_as_spark",
    "load_table_changes_as_pandas",
    "load_table_changes_as_spark",
    "__version__",
]
