"""Streaming sink into a TableLog via foreachBatch.

Structured Streaming's exactly-once contract for foreachBatch sinks rests on
idempotent writes per (queryId, epochId); the commit log records the epoch
in commitInfo so replayed batches after a failure are detected and skipped —
the same dedup Delta's streaming sink performs via transaction versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from delta_sharing_spark.plans.log import TableLog


def _last_committed_epoch(log: TableLog, query_id: str) -> int:
    """Latest committed epoch for this writer, from snapshot transaction
    state (Delta's SetTransaction): checkpoint + tail replay, so the lookup
    is O(new commits) per micro-batch — never a scan of the full history."""
    return log.snapshot().transactions.get(query_id, -1)


def write_stream_to_table(stream_df: DataFrame, path: str,
                          checkpoint_location: str,
                          query_name: str | None = None,
                          trigger: dict | None = None,
                          txn_app_id: str | None = None,
                          mode: str = "append",
                          merge_keys: list[str] | None = None) -> StreamingQuery:
    """``writeStream`` into the commit log: each micro-batch becomes one
    commit tagged with (txnAppId, epochId) — Delta's streaming-sink
    transaction identity; replayed epochs are skipped (idempotent restart).
    ``txn_app_id`` defaults to the checkpoint location (one writer per
    checkpoint).

    ``mode="append"`` (default) appends each batch; ``mode="merge"``
    UPSERTS each batch on ``merge_keys`` (the foreachBatch CDC-apply
    pattern — a streaming source of changes maintains a keyed target
    table). Exactly-once holds for both: the epoch stamp rides in the
    same atomic commit as the batch's effect."""
    if mode not in ("append", "merge"):
        raise ValueError(f"unknown sink mode {mode!r}")
    if mode == "merge" and not merge_keys:
        raise ValueError("mode='merge' requires merge_keys")
    spark = stream_df.sparkSession
    app_id = txn_app_id or checkpoint_location

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # The (txnAppId, epochId) stamp rides inside the SAME atomic
        # no-clobber commit as the data (CommitInfo.operationParameters) —
        # Delta's SetTransaction pattern. There is no window where the data
        # is committed but the epoch stamp is not: a crash before
        # _write_commit leaves nothing; a crash after leaves both. A
        # replayed epoch is detected from the committed log and skipped.
        txn = {"queryId": app_id, "epochId": str(epoch_id)}
        log = TableLog(spark, path)
        if not log.exists():
            if batch_df.isEmpty():
                return
            if mode == "merge":
                batch_df = batch_df.dropDuplicates(merge_keys)
            log.create(batch_df, name="stream_sink", operation_parameters=txn)
            return
        if epoch_id <= _last_committed_epoch(log, app_id):
            return  # replayed batch after restart — already committed
        if batch_df.isEmpty():
            return
        if mode == "merge":
            # one row per key per batch (MERGE precondition); the upsert
            # rewrites only files containing matched keys
            log.merge(batch_df.dropDuplicates(merge_keys), merge_keys,
                      operation_parameters=txn)
        else:
            log.append(batch_df, operation_parameters=txn)

    writer: DataStreamWriter = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_location)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
