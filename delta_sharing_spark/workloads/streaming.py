"""Streaming workloads: drive the ``deltashare`` Structured Streaming source
to completion and verify the drained result against SQL oracles.

Each workload starts a real micro-batch query (memory sink, processing-time
trigger), drains it with ``processAllAvailable`` — exercising admission
control, offset tracking, and the executor-side Arrow reader — then returns
the materialized result as a DataFrame.

Note on ``Trigger.AvailableNow``: the Python data source API has no
prepareForTriggerAvailableNow hook, so Spark freezes the FIRST
latestOffset() as the run's end. Pass ``.option("availableNow", "true")``
to the source so that frozen end is the true end (full one-batch drain —
see sources/datasource.py); for capped multi-batch draining use a
processing-time trigger + processAllAvailable (as in ``_drain`` here).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_sharing_spark.sources.datasource import SharedTableDataSource
from delta_sharing_spark.workloads import workload
from delta_sharing_spark.workloads.engine import _events_cdf, _lineitem_shared


def _drain(spark: SparkSession, path: str, options: dict[str, str]) -> tuple[DataFrame, int]:
    """Run a deltashare stream to completion; return (result_df, n_batches)."""
    spark.dataSource.register(SharedTableDataSource)
    try:  # needed for batch-side pushFilters; harmless if already set
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    name = f"dss_stream_{uuid.uuid4().hex[:8]}"
    reader = spark.readStream.format("deltashare").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    return spark.table(name), n_batches


@workload(
    "stream_snapshot_drain",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_click
    FROM events WHERE NOT (value < 5)
    """,
)
def stream_snapshot_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-snapshot streaming (no startingVersion -> full snapshot at
    latest version, ref DeltaSharingSource.scala:450-533) over the
    events_cdf fixture after its DELETE and UPDATE commits: the drained
    stream must equal the latest snapshot exactly."""
    path = _events_cdf(spark, sf_dir)
    out, _ = _drain(spark, path, {"maxFilesPerTrigger": "4"})
    return out.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_click"),
    )


@workload(
    "stream_availablenow_drain",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events WHERE NOT (value < 5)
    """,
)
def stream_availablenow_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow drain (ref DeltaSharingSource.scala:169-199
    freeze-and-drain): a real .trigger(availableNow=True) run with
    maxFilesPerTrigger=1 + the availableNow source option must produce the
    complete latest snapshot, not one capped batch."""
    import tempfile

    path = _events_cdf(spark, sf_dir)
    spark.dataSource.register(SharedTableDataSource)
    with tempfile.TemporaryDirectory() as tmp:
        out_dir, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
        q = (spark.readStream.format("deltashare").option("path", path)
             .option("maxFilesPerTrigger", "1")
             .option("availableNow", "true")
             .load()
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        out = spark.read.parquet(out_dir)
        result = out.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        # materialize before the tempdir vanishes
        rows = result.collect()
    return spark.createDataFrame(rows, result.schema)


@workload(
    "stream_incremental_appends",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def stream_incremental_appends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental streaming from startingVersion=1: only the append
    commit's files are emitted (change-tracking mode, not snapshot mode)."""
    path = _lineitem_shared(spark, sf_dir)
    out, _ = _drain(
        spark, path, {"startingVersion": "1", "maxFilesPerTrigger": "2"}
    )
    return out.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@workload(
    "stream_cdf_drain",
    oracle="""
    WITH after_delete AS (SELECT * FROM events WHERE NOT (value < 5))
    SELECT 'insert' AS change_type, CAST(COUNT(*) AS BIGINT) AS n FROM events
    UNION ALL
    SELECT 'delete', CAST(COUNT(*) AS BIGINT) FROM events WHERE value < 5
    UNION ALL
    SELECT 'update_preimage', CAST(COUNT(*) AS BIGINT)
    FROM after_delete WHERE event_type = 'click'
    UNION ALL
    SELECT 'update_postimage', CAST(COUNT(*) AS BIGINT)
    FROM after_delete WHERE event_type = 'click'
    """,
)
def stream_cdf_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDF: drain the change feed from version 0 through capped
    micro-batches; per-change-type counts must equal the batch CDF oracle
    (ref DeltaSharingSource.scala:603-728 streaming CDF)."""
    path = _events_cdf(spark, sf_dir)
    out, _ = _drain(spark, path, {
        "startingVersion": "0", "readChangeFeed": "true",
        "maxFilesPerTrigger": "4",
    })
    return (
        out.groupBy(F.col("_change_type").alias("change_type"))
        .agg(F.count("*").alias("n"))
    )
