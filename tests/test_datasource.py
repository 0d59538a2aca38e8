"""deltashare data source: batch pushdown pruning + streaming admission,
change-commit validation (ref DeltaSharingSourceSuite intent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_sharing_spark.plans.log import TableLog
from delta_sharing_spark.table import SharedTable
from delta_sharing_spark.sources.datasource import (
    SharedTableDataSource,
    SharedTableStreamReader,
)


@pytest.fixture()
def stream_table(spark, events, table_dir):
    log = TableLog(spark, table_dir)
    log.create(events, partition_by=["event_type"], name="t")
    log.append(events.filter("event_id < 30"))
    spark.dataSource.register(SharedTableDataSource)
    return table_dir


class TestBatch:
    def test_read_and_time_travel(self, spark, events, stream_table):
        n = events.count()
        extra = events.filter("event_id < 30").count()
        df = spark.read.format("deltashare").option("path", stream_table).load()
        assert df.count() == n + extra
        v0 = (spark.read.format("deltashare").option("path", stream_table)
              .option("version", "0").load())
        assert v0.count() == n

    def test_filter_pushdown_correct(self, spark, events, stream_table):
        df = spark.read.format("deltashare").option("path", stream_table).load()
        got = df.filter(F.col("event_type") == "click").count()
        want = (events.filter("event_type = 'click'").count()
                + events.filter("event_id < 30 AND event_type = 'click'").count())
        assert got == want

    def test_planner_prunes_files(self, spark, stream_table):
        from pyspark.sql.datasource import EqualTo

        from delta_sharing_spark.sources.datasource import SharedTableBatchReader

        reader = SharedTableBatchReader({"path": stream_table}, None)
        all_parts = reader.partitions()
        reader.pushFilters([EqualTo(("event_type",), "click")])
        pruned = reader.partitions()
        assert 0 < len(pruned) < len(all_parts)


class TestFilterConversion:
    def test_in_and_null_filters(self, spark, stream_table):
        from pyspark.sql.datasource import In, IsNotNull, IsNull

        from delta_sharing_spark.sources.datasource import (
            SharedTableBatchReader,
        )

        reader = SharedTableBatchReader({"path": stream_table}, None)
        all_parts = reader.partitions()
        # In over two partition values prunes to exactly those partitions
        reader.pushFilters([In(("event_type",), ("click", "view"))])
        pruned = reader.partitions()
        assert 0 < len(pruned) < len(all_parts)
        # IsNotNull on a never-null partition column keeps everything
        reader.pushFilters([IsNotNull(("event_type",))])
        assert len(reader.partitions()) == len(all_parts)
        # IsNull on that column prunes everything
        reader.pushFilters([IsNull(("event_type",))])
        assert len(reader.partitions()) == 0

    def test_equal_null_safe(self, spark, stream_table):
        from pyspark.sql.datasource import EqualNullSafe, EqualTo

        from delta_sharing_spark.sources.datasource import (
            SharedTableBatchReader,
        )

        reader = SharedTableBatchReader({"path": stream_table}, None)
        # <=> non-null prunes exactly like plain equality
        reader.pushFilters([EqualTo(("event_type",), "click")])
        eq_parts = reader.partitions()
        reader.pushFilters([EqualNullSafe(("event_type",), "click")])
        assert len(reader.partitions()) == len(eq_parts)
        # <=> NULL is IS NULL: a never-null partition column prunes all
        reader.pushFilters([EqualNullSafe(("event_type",), None)])
        assert len(reader.partitions()) == 0

    def test_oversize_in_not_translated(self, spark, stream_table):
        from pyspark.sql.datasource import In

        from delta_sharing_spark.sources.datasource import (
            SharedTableBatchReader,
        )

        reader = SharedTableBatchReader({"path": stream_table}, None)
        all_parts = reader.partitions()
        big = In(("event_type",), tuple(f"v{i}" for i in range(25)))
        reader.pushFilters([big])
        # >20 entries: kept exact by Spark, no pruning
        assert len(reader.partitions()) == len(all_parts)


class TestVersionPollThrottle:
    def test_latest_offset_cached_within_interval(self, spark, events,
                                                  stream_table):
        from delta_sharing_spark.sources.datasource import (
            SharedTableStreamReader,
        )

        r = SharedTableStreamReader(
            {"path": stream_table,
             "querytableversionintervalseconds": "300"}, None)
        r.initialOffset()
        end1 = r.latestOffset()
        TableLog(spark, stream_table).append(events.filter("event_id < 5"))
        # within the interval: no re-list, no progress reported
        assert r.latestOffset() == r._last_planned
        # force the interval to elapse: the append is picked up
        r._last_poll_ts -= 301
        end3 = r.latestOffset()
        assert self._key(end3) > self._key(end1)

    @staticmethod
    def _key(o):
        return (int(o["version"]), int(o["index"]))


class TestStreaming:
    def _drain(self, spark, path, name, **options):
        reader = spark.readStream.format("deltashare").option("path", path)
        for k, v in options.items():
            reader = reader.option(k, v)
        q = (reader.load().writeStream.format("memory").queryName(name)
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        q.stop()
        batches = [p["numInputRows"] for p in q.recentProgress
                   if p["numInputRows"] > 0]
        return spark.table(name), batches

    def test_admission_cap_batches(self, spark, events, stream_table):
        out, batches = self._drain(spark, stream_table, "adm",
                                   startingVersion="0", maxFilesPerTrigger="2")
        n_files = len(TableLog(spark, stream_table).snapshot().files)
        import math
        assert len(batches) >= math.ceil(n_files / 2) - 1
        total = events.count() + events.filter("event_id < 30").count()
        assert out.count() == total

    def test_starting_timestamp(self, spark, events, stream_table):
        # resolve the exact timestamp of v1 and stream changes from it:
        # only the append's rows arrive (no initial snapshot)
        ts = TableLog(spark, stream_table).commits(1, 1)[0].timestamp
        import datetime as _dt

        iso = _dt.datetime.fromtimestamp(
            ts / 1000, _dt.timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")
        out, _batches = self._drain(spark, stream_table, "stts",
                                    startingTimestamp=iso)
        assert out.count() == events.filter("event_id < 30").count()

    def test_starting_version_and_timestamp_conflict(self, spark,
                                                     stream_table):
        import pyspark.errors

        reader = (spark.readStream.format("deltashare")
                  .option("path", stream_table)
                  .option("startingVersion", "0")
                  .option("startingTimestamp", "2020-01-01 00:00:00"))
        q = None
        try:
            with pytest.raises(Exception, match="mutually"):
                q = (reader.load().writeStream.format("memory")
                     .queryName("stconf").start())
                q.processAllAvailable()
        finally:
            if q is not None:
                q.stop()

    def test_delete_commit_errors_without_flag(self, spark, events, tmp_path):
        d = str(tmp_path / "del")
        log = TableLog(spark, d)
        log.create(events.limit(100), name="t")
        log.delete("event_id < 10")
        reader = SharedTableStreamReader({"path": d, "startingversion": "0"},
                                         None)
        # a rewriting DELETE is remove+add -> the UPDATE-class error
        with pytest.raises(ValueError, match="ignoreChanges"):
            reader._file_sequence(0)

    def test_skip_change_commits(self, spark, events, tmp_path):
        d = str(tmp_path / "skip")
        log = TableLog(spark, d)
        log.create(events.limit(100), name="t")
        log.delete("event_id < 10")
        log.append(events.filter("event_id >= 900"))
        reader = SharedTableStreamReader(
            {"path": d, "startingversion": "1", "skipchangecommits": "true"},
            None)
        seq = reader._file_sequence(1)
        versions = {e[0] for e in seq}
        assert versions == {2}  # delete commit skipped entirely

    def test_ignore_changes_keeps_adds(self, spark, events, tmp_path):
        d = str(tmp_path / "ign")
        log = TableLog(spark, d)
        log.create(events.limit(100), name="t")
        log.delete("event_id < 10")  # rewrite commit: remove + add
        # ignoreDeletes alone is NOT enough for a rewrite commit
        # (ref DeltaSharingSource.scala:994-1035)
        r_del = SharedTableStreamReader(
            {"path": d, "startingversion": "1", "ignoredeletes": "true"},
            None)
        with pytest.raises(ValueError, match="ignoreChanges"):
            r_del._file_sequence(1)
        reader = SharedTableStreamReader(
            {"path": d, "startingversion": "1", "ignorechanges": "true"},
            None)
        seq = reader._file_sequence(1)
        assert all(e[0] == 1 for e in seq)
        assert len(seq) >= 1  # the rewritten file is admitted


class TestLogReplayAmortized:
    def test_latest_offset_polls_parse_only_new_commits(self, spark, events,
                                                        tmp_path):
        """Repeated latestOffset() polling must parse each commit JSON once
        per reader lifetime (immutable-commit cache), not re-read the whole
        log every micro-batch."""
        d = str(tmp_path / "amort")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 100"), name="t")
        for k in range(5):
            log.append(events.filter(
                f"event_id >= {100 + 10 * k} and event_id < {110 + 10 * k}"))

        reader = SharedTableStreamReader(
            {"path": d, "startingversion": "0"}, None)
        parsed: list[int] = []
        inner = reader._log()
        orig = type(inner)._read_commit_uncached

        def spy(self_, version):
            parsed.append(version)
            return orig(self_, version)

        inner._read_commit_uncached = spy.__get__(inner)
        reader.initialOffset()
        for _ in range(5):
            reader.latestOffset()
        first_wave = len(parsed)
        assert sorted(set(parsed)) == [0, 1, 2, 3, 4, 5]
        assert first_wave == 6, f"re-parsed commits: {parsed}"
        # a new commit arrives: only IT is parsed on the next polls
        log.append(events.filter("event_id >= 150 and event_id < 160"))
        for _ in range(3):
            reader.latestOffset()
        assert parsed[first_wave:] == [6]


class TestAvailableNow:
    """Trigger.AvailableNow: the Python DS API has no
    prepareForTriggerAvailableNow hook — Spark's wrapper freezes the FIRST
    latestOffset() as the run's end, so a capped stream silently truncates
    to one capped batch. The availableNow=true source option lifts the caps
    so that frozen end is the true end (Trigger.Once-style full drain,
    ref DeltaSharingSource.scala:169-199 freeze-and-drain semantics)."""

    def _run(self, spark, path, out_dir, ckpt):
        q = (spark.readStream.format("deltashare").option("path", path)
             .option("maxFilesPerTrigger", "1")
             .option("availableNow", "true")
             .load()
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    def test_available_now_drains_fully(self, spark, events, tmp_path):
        d = str(tmp_path / "an_table")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 100"), name="t")
        for k in range(5):
            log.append(events.filter(
                f"event_id >= {100 + 100 * k} and event_id < {200 + 100 * k}"))
        spark.dataSource.register(SharedTableDataSource)
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, d, out_dir, ckpt)
        got = spark.read.parquet(out_dir)
        want = events.filter("event_id < 600").count()
        assert got.count() == want  # capped stream must NOT truncate
        # incremental second run from the same checkpoint: exactly-once
        log.append(events.filter("event_id >= 600 and event_id < 700"))
        self._run(spark, d, out_dir, ckpt)
        final = spark.read.parquet(out_dir)
        assert final.count() == want + 100
        assert final.select("event_id").distinct().count() == want + 100


class TestCheckpointRestart:
    def test_restart_continues_from_checkpoint(self, spark, events, tmp_path):
        """Stop a checkpointed stream, append new commits, restart with the
        same checkpoint: the sink must end up with exactly one copy of every
        row (no reprocessing, no gaps)."""
        import uuid

        d = str(tmp_path / "cp_table")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 400"), name="t")
        spark.dataSource.register(SharedTableDataSource)

        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")

        def run_stream():
            q = (spark.readStream.format("deltashare").option("path", d)
                 .option("startingVersion", "0")
                 .option("maxFilesPerTrigger", "2")
                 .load()
                 .writeStream.format("parquet")
                 .option("path", out_dir)
                 .option("checkpointLocation", ckpt)
                 .trigger(processingTime="200 milliseconds")
                 .queryName(f"cp_{uuid.uuid4().hex[:6]}")
                 .start())
            q.processAllAvailable()
            q.stop()

        run_stream()
        first = spark.read.parquet(out_dir).count()
        assert first == 400
        # new data arrives while the stream is down
        log.append(events.filter("event_id >= 400 and event_id < 500"))
        log.append(events.filter("event_id >= 900"))
        run_stream()
        final = spark.read.parquet(out_dir)
        assert final.count() == 400 + 100 + 100
        # exactly-once: no duplicated event_ids
        assert final.select("event_id").distinct().count() == 600


class TestRestartProtocol:
    """Protocol-level restart determinism. The pyspark 4.1 runner's verified
    call sequences (traced via the ``_calllog`` option):

    - fresh stream: latestOffset() arrives FIRST (floor=None), then
      initialOffset(), then partitions(initial, end);
    - restart (committed or uncommitted last batch): Spark always replays
      the last logged batch via partitions(start, end) BEFORE the first
      latestOffset(), restoring the planning floor.

    The regression risk (ADVICE r01): planning a batch end in a different
    (version, index) sequence space — a fresh snapshot at the current
    latest — than the checkpointed start, duplicating or skipping files."""

    def _reader(self, path, max_files=2):
        return SharedTableStreamReader(
            {"path": path, "maxfilespertrigger": str(max_files)}, None)

    def _paths(self, parts):
        return {p.path for p in parts}

    def test_snapshot_mode_restart_no_dup_no_skip(self, spark, events,
                                                  tmp_path):
        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 300").repartition(4), name="t")
        log.append(events.filter("event_id >= 300 and event_id < 400"))
        log.append(events.filter("event_id >= 400 and event_id < 500"))

        # run 1 (fresh): latestOffset first, snapshot-mode, one capped batch,
        # committed; then the query stops
        r1 = self._reader(d)
        e1 = r1.latestOffset()
        start = r1.initialOffset()
        assert start["isStartingVersion"]
        batch1 = self._paths(r1.partitions(start, e1))
        assert len(batch1) == 2  # capped
        r1.commit(e1)

        # everything the stream must eventually deliver, in start's space
        full = self._paths(r1.partitions(start, {"version": 10 ** 6,
                                                 "index": 0}))

        # run 2 (restart): fresh reader; Spark replays the last logged batch
        # through partitions() BEFORE latestOffset — floor restored there
        r2 = self._reader(d)
        replay = self._paths(r2.partitions(start, e1))
        assert replay == batch1  # deterministic replay
        e2 = r2.latestOffset()
        assert e2["version"] >= e1["version"]  # never regresses
        batch2 = self._paths(r2.partitions(e1, e2))
        assert len(batch2) == 2               # still capped after restart
        assert batch1 & batch2 == set()       # no duplicates

        # drain to the end: union covers everything exactly once
        seen = batch1 | batch2
        r2.commit(e2)
        prev = e2
        for _ in range(50):
            nxt = r2.latestOffset()
            if nxt == prev:
                break
            b = self._paths(r2.partitions(prev, nxt))
            assert b & seen == set()
            seen |= b
            r2.commit(nxt)
            prev = nxt
        assert seen == full

    def test_commit_restores_floor_monotonic(self, spark, events, tmp_path):
        d = str(tmp_path / "t2")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 100"), name="t")
        r = self._reader(d, max_files=100)
        start = r.initialOffset()
        end = r.latestOffset()
        r.commit(end)
        # a stale commit replay must never move the floor backwards
        r.commit(start)
        assert r._last_planned == end


class TestStreamSink:
    def test_stream_into_table_log(self, spark, events, tmp_path):
        """deltashare source -> TableLog sink: the sink table converges to
        the source snapshot, one append commit per non-empty batch."""
        from delta_sharing_spark.streaming.sink import write_stream_to_table

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        ckpt = str(tmp_path / "ck")
        TableLog(spark, src).create(events.filter("event_id < 300"),
                                    partition_by=["event_type"], name="src")
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0")
                  .option("maxFilesPerTrigger", "2").load())
        q = write_stream_to_table(
            stream, dst, ckpt, trigger={"processingTime": "200 milliseconds"})
        q.processAllAvailable()
        q.stop()
        sink_log = TableLog(spark, dst)
        from delta_sharing_spark.table import SharedTable
        assert SharedTable(spark, dst).to_df().count() == 300
        # restart against the same checkpoint: no duplicate commits
        stream2 = (spark.readStream.format("deltashare").option("path", src)
                   .option("startingVersion", "0")
                   .option("maxFilesPerTrigger", "2").load())
        q2 = write_stream_to_table(
            stream2, dst, ckpt, trigger={"processingTime": "200 milliseconds"})
        q2.processAllAvailable()
        q2.stop()
        assert SharedTable(spark, dst).to_df().count() == 300

    def test_epoch_lookup_is_o_new_commits(self, spark, events, tmp_path):
        """Sink idempotency state rides the snapshot (SetTransaction
        pattern): a fresh TableLog resolves the last committed epoch from
        checkpoint + tail — commit JSONs parsed must be bounded by the
        checkpoint interval, not the table's history length."""
        from delta_sharing_spark.streaming.sink import _last_committed_epoch

        path = str(tmp_path / "t")
        log = TableLog(spark, path)
        batch = events.limit(5)
        log.create(batch, name="t",
                   operation_parameters={"queryId": "qA", "epochId": "0"})
        for epoch in range(1, 26):
            log.append(batch, operation_parameters={
                "queryId": "qA", "epochId": str(epoch)})
        # snapshot state carries the txn map
        assert log.snapshot().transactions == {"qA": 25}

        fresh = TableLog(spark, path)
        parsed = []
        orig = TableLog._read_commit_uncached

        def counting(self, version):
            parsed.append(version)
            return orig(self, version)

        TableLog._read_commit_uncached = counting
        try:
            assert _last_committed_epoch(fresh, "qA") == 25
            assert _last_committed_epoch(fresh, "other") == -1
        finally:
            TableLog._read_commit_uncached = orig
        interval = 10  # CHECKPOINT_INTERVAL_DEFAULT
        assert len(set(parsed)) <= interval + 2, sorted(set(parsed))

    def test_epoch_stamp_is_atomic_with_commit(self, spark, events, tmp_path):
        """The (queryId, epochId) stamp must land in the SAME commit file as
        the data actions (CommitInfo.operationParameters), not via a
        post-commit rewrite — otherwise a crash between append and stamp
        makes the replayed epoch undetectable (double-append)."""
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        ckpt = str(tmp_path / "ck")
        TableLog(spark, src).create(events.filter("event_id < 100"),
                                    name="src")
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0").load())
        from delta_sharing_spark.streaming.sink import write_stream_to_table
        q = write_stream_to_table(
            stream, dst, ckpt, trigger={"processingTime": "200 milliseconds"})
        q.processAllAvailable()
        q.stop()
        sink_log = TableLog(spark, dst)
        for commit in sink_log.commits():
            if commit.adds:  # every data commit carries its txn identity
                params = commit.info.operationParameters or {}
                assert params.get("queryId") == ckpt
                assert params.get("epochId") is not None


class TestOptionAliases:
    def test_version_as_of_and_read_change_data(self, spark, events,
                                                tmp_path):
        """Reference option spellings (DeltaSharingOptions.scala):
        versionAsOf/timestampAsOf for batch time travel, readChangeData
        as the readChangeFeed alias."""
        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "alias")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 10"), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.append(events.filter("event_id >= 10 AND event_id < 15"))
        v0 = (spark.read.format("deltashare").option("path", d)
              .option("versionAsOf", "0").load())
        assert v0.count() == 10
        ch = (spark.read.format("deltashare").option("path", d)
              .option("readChangeData", "true")
              .option("startingVersion", "1").load())
        assert ch.count() == 5
        assert {r["_change_type"] for r in ch.collect()} == {"insert"}
        import pyspark.errors

        with pytest.raises(pyspark.errors.PySparkException,
                           match="mutually exclusive"):
            (spark.read.format("deltashare").option("path", d)
             .option("versionAsOf", "0")
             .option("timestampAsOf", "2024-01-01").load())

    def test_starting_version_latest(self, spark, events, tmp_path):
        """startingVersion=latest: only changes committed AFTER stream
        start are served — no snapshot backfill."""
        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "latest")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 10"), name="t")
        log.append(events.filter("event_id >= 10 AND event_id < 20"))
        q = (spark.readStream.format("deltashare").option("path", d)
             .option("startingVersion", "latest").load()
             .writeStream.format("memory").queryName("svl")
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        assert spark.table("svl").count() == 0  # backlog skipped
        log.append(events.filter("event_id >= 20 AND event_id < 23"))
        q.processAllAvailable()
        q.stop()
        got = {r["event_id"] for r in spark.table("svl").collect()}
        assert got == {20, 21, 22}


class TestBatchCDFReader:
    def test_batch_read_change_feed(self, spark, events, tmp_path):
        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "cdf")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 20"), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.delete("event_id < 5")
        ch = (spark.read.format("deltashare").option("path", d)
              .option("readChangeFeed", "true")
              .option("startingVersion", "0").load())
        by_type = {r["_change_type"]: r["n"] for r in
                   ch.groupBy("_change_type").agg(
                       F.count("*").alias("n")).collect()}
        assert by_type == {"insert": 20, "delete": 5}
        # version window: only the delete commit
        ch1 = (spark.read.format("deltashare").option("path", d)
               .option("readChangeFeed", "true")
               .option("startingVersion", "1")
               .option("endingVersion", "1").load())
        assert {r["_change_type"] for r in ch1.collect()} == {"delete"}
        assert ch1.count() == 5
        # commit columns attached per action
        assert ch1.select("_commit_version").distinct().collect()[0][0] == 1

    def test_batch_cdf_requires_enablement(self, spark, events, tmp_path):
        from delta_sharing_spark.cdf import CDFError  # noqa: F401

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "nocdf")
        TableLog(spark, d).create(events.limit(5), name="t")
        import pyspark.errors

        with pytest.raises(pyspark.errors.PySparkException,
                           match="change data feed is not enabled"):
            (spark.read.format("deltashare").option("path", d)
             .option("readChangeFeed", "true")
             .option("startingVersion", "0").load().collect())


class TestStreamRestartAfterSchemaChange:
    def test_restart_reads_backlog_under_new_schema(self, spark, events,
                                                    tmp_path):
        """Restarting a stream after rename + widen (column mapping) must
        read BACKLOG files written under the old physical layout correctly:
        the executor projection resolves physical names and casts widened
        types, so pre-change rows surface under the new logical schema —
        the streaming twin of batch CDF's schema epochs."""
        from pyspark.sql import types as T

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "evolve")
        log = TableLog(spark, d)
        log.create(events.select(
            "event_id", "event_type",
            (F.col("event_id") % 100).cast("int").alias("score"))
            .filter("event_id < 20"), name="evolve")
        log.enable_column_mapping()
        log.rename_column("score", "points")
        snap = log.snapshot()
        widened = T.StructType([
            T.StructField(f.name,
                          T.LongType() if f.name == "points" else f.dataType,
                          f.nullable, f.metadata)
            for f in snap.schema.fields])
        log.update_metadata(schema=widened)
        log.append(events.select(
            "event_id", "event_type",
            (F.col("event_id") % 100).cast("long").alias("points"))
            .filter("event_id >= 20 AND event_id < 30"))
        # fresh stream (as after a restart): plans with the NEW schema,
        # backlog v0 files still stream through converted
        q = (spark.readStream.format("deltashare").option("path", d)
             .option("startingVersion", "0").load()
             .writeStream.format("memory").queryName("evost")
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        q.stop()
        out = spark.table("evost")
        assert dict(out.dtypes)["points"] == "bigint"
        got = {r["event_id"]: r["points"] for r in out.collect()}
        assert len(got) == 30
        assert all(got[i] == i % 100 for i in got)

    def test_restart_streams_backlog_across_nested_widen(self, spark,
                                                         tmp_path):
        """NESTED widen mid-history (widen_column_type('s.x', long)):
        a fresh stream from v0 plans under the wide nested schema and the
        narrow backlog files upcast inside the struct (the executor's
        Arrow struct cast) — the streaming leg of the nested
        type-widening feature."""
        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "nested_evolve")
        log = TableLog(spark, d)
        log.create(spark.sql(
            "SELECT id, named_struct('x', CAST(id AS INT)) s "
            "FROM range(5)").coalesce(1), name="t",
            configuration={"delta.enableTypeWidening": "true"})
        log.widen_column_type("s.x", "long")
        log.append(spark.sql(
            "SELECT CAST(99 AS LONG) id, "
            "named_struct('x', CAST(8000000000 AS LONG)) s"))
        name = "nested_evost"
        q = (spark.readStream.format("deltashare").option("path", d)
             .option("startingVersion", "0").load()
             .writeStream.format("memory").queryName(name)
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        q.stop()
        out = spark.table(name)
        assert dict(out.dtypes)["s"] == "struct<x:bigint>"
        got = sorted(r["s"]["x"] for r in out.collect())
        assert got == [0, 1, 2, 3, 4, 8000000000]


class TestSchemaTrackingLocation:
    """Delta-style schemaTrackingLocation: a gate-stopping metadata change
    becomes a restart boundary instead of a dead end. Protocol per
    evolution: (1) the running stream drains every file BEFORE the change,
    then persists the new schema under <location>/_schema_log and fails
    with RetryableSchemaEvolution; (2) the restarted query plans on the
    tracked schema and continues from the same checkpoint."""

    def _run(self, spark, d, out_dir, ckpt, track):
        import uuid

        q = (spark.readStream.format("deltashare").option("path", d)
             .option("startingVersion", "0")
             .option("maxFilesPerTrigger", "2")
             .option("schemaTrackingLocation", track)
             .load()
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(processingTime="150 milliseconds")
             .queryName(f"st_{uuid.uuid4().hex[:6]}")
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def test_add_column_evolves_on_restart(self, spark, events, tmp_path):
        from pyspark.sql.streaming import StreamingQueryException

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "st_table")
        log = TableLog(spark, d)
        log.create(events.select("event_id", "event_type")
                   .filter("event_id < 200"), name="st")
        log.enable_column_mapping()
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        track = str(tmp_path / "track")

        self._run(spark, d, out_dir, ckpt, track)
        assert spark.read.parquet(out_dir).count() == 200

        log.add_column("extra", "int")
        log.append(events.select("event_id", "event_type")
                   .withColumn("extra", F.lit(7).cast("int"))
                   .filter("event_id >= 200 AND event_id < 300"))

        # backlog is already drained -> the restarted run hits the boundary
        # immediately: persists the schema, fails retryable
        with pytest.raises(StreamingQueryException) as exc:
            self._run(spark, d, out_dir, ckpt, track)
        assert "schema tracking" in str(exc.value)
        from delta_sharing_spark.streaming.schema import SchemaTrackingLog

        entry = SchemaTrackingLog(track).latest()
        assert entry is not None and "extra" in entry["schemaString"]

        # restart #2 plans on the tracked schema and drains the new files
        self._run(spark, d, out_dir, ckpt, track)
        final = spark.read.option("mergeSchema", "true").parquet(out_dir)
        assert final.count() == 300
        got = {r["event_id"]: r["extra"] for r in final.collect()}
        assert all(got[i] == 7 for i in range(200, 300))
        assert all(got[i] is None for i in range(0, 200))

    def test_drop_column_evolves_and_serves_backlog_first(
            self, spark, events, tmp_path):
        """A drop mid-backlog: the first run drains every pre-change file
        (under the old plan), THEN fails with the evolution error; the
        restart serves post-change files without the dropped column."""
        from pyspark.sql.streaming import StreamingQueryException

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "st_drop")
        log = TableLog(spark, d)
        log.create(events.select("event_id", "event_type", "value")
                   .filter("event_id < 100"), name="std")
        log.enable_column_mapping()
        log.append(events.select("event_id", "event_type", "value")
                   .filter("event_id >= 100 AND event_id < 150"))
        log.drop_column("value")
        log.append(events.select("event_id", "event_type")
                   .filter("event_id >= 150 AND event_id < 160"))
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        track = str(tmp_path / "track")

        with pytest.raises(StreamingQueryException):
            self._run(spark, d, out_dir, ckpt, track)
        # every pre-change row drained before the failure, with values
        pre = spark.read.parquet(out_dir)
        assert pre.count() == 150
        assert pre.filter("value IS NOT NULL").count() == 150

        self._run(spark, d, out_dir, ckpt, track)
        final = spark.read.option("mergeSchema", "true").parquet(out_dir)
        assert final.count() == 160
        assert final.select("event_id").distinct().count() == 160

    def test_cdf_stream_evolves_on_restart(self, spark, events, tmp_path):
        """readChangeFeed + schemaTrackingLocation: the CDF gate excludes
        the virtual columns from the boundary check and the evolved
        restart keeps draining changes under the new schema."""
        from pyspark.sql.streaming import StreamingQueryException

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "st_cdf")
        log = TableLog(spark, d)
        log.create(events.select("event_id", "event_type", "value")
                   .filter("event_id < 80"), name="stc",
                   configuration={"enableChangeDataFeed": "true"})
        log.enable_column_mapping()
        log.drop_column("value")
        log.append(events.select("event_id", "event_type")
                   .filter("event_id >= 80 AND event_id < 90"))
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        track = str(tmp_path / "track")

        def run():
            import uuid

            q = (spark.readStream.format("deltashare").option("path", d)
                 .option("startingVersion", "0")
                 .option("readChangeFeed", "true")
                 .option("maxFilesPerTrigger", "2")
                 .option("schemaTrackingLocation", track)
                 .load()
                 .writeStream.format("parquet").option("path", out_dir)
                 .option("checkpointLocation", ckpt)
                 .trigger(processingTime="150 milliseconds")
                 .queryName(f"stc_{uuid.uuid4().hex[:6]}")
                 .start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        with pytest.raises(StreamingQueryException):
            run()  # drains the 80 pre-drop inserts, then evolves
        assert spark.read.parquet(out_dir).count() == 80
        run()
        final = spark.read.option("mergeSchema", "true").parquet(out_dir)
        assert final.count() == 90
        assert final.filter("_change_type = 'insert'").count() == 90

    def test_cdf_row_ids_survive_tracked_evolution(self, spark,
                                                   tmp_path):
        """rowIds=true + schemaTrackingLocation: the evolution boundary
        check must ignore the _row_id/_row_commit_version virtual columns
        (like the three CDF ones), and ids must stay exact across the
        widen-restart — pre-widen rows keep their creation ids under the
        evolved plan."""
        from pyspark.sql import functions as F
        from pyspark.sql.streaming import StreamingQueryException

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "rt_evolve")
        one = lambda df: df.repartition(1).sortWithinPartitions("k")  # noqa: E731
        log = TableLog(spark, d)
        log.create(one(spark.range(20).selectExpr(
            "id AS k", "CAST(id AS INT) AS v")), name="t",
            configuration={"delta.enableRowTracking": "true",
                           "delta.enableChangeDataFeed": "true",
                           "delta.enableTypeWidening": "true"})
        log.append(one(spark.range(20, 30).selectExpr(
            "id AS k", "CAST(id AS INT) AS v")))
        log.widen_column_type("v", "long")
        log.append(one(spark.range(30, 35).selectExpr(
            "id AS k", "CAST(id AS LONG) AS v")))
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        track = str(tmp_path / "track")

        def run():
            import uuid

            q = (spark.readStream.format("deltashare").option("path", d)
                 .option("startingVersion", "0")
                 .option("readChangeFeed", "true")
                 .option("rowIds", "true")
                 .option("maxFilesPerTrigger", "1")
                 .option("schemaTrackingLocation", track)
                 .load()
                 .writeStream.format("parquet").option("path", out_dir)
                 .option("checkpointLocation", ckpt)
                 .trigger(processingTime="150 milliseconds")
                 .queryName(f"rte_{uuid.uuid4().hex[:6]}")
                 .start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        with pytest.raises(StreamingQueryException):
            run()  # drains pre-widen, then evolves at the widen commit
        run()
        # the sink holds int-v files (pre-widen) and bigint-v files: read
        # under the widened schema (Spark's parquet reader upcasts the
        # narrow half natively — parquet mergeSchema does not widen)
        final = spark.read.schema(
            "k long, v long, _change_type string, _commit_version long, "
            "_commit_timestamp long, _row_id long, _row_commit_version "
            "long").parquet(out_dir)
        rows = {r.k: (r._row_id, r._row_commit_version, r.v) for r in
                final.filter("_change_type = 'insert'").collect()}
        assert rows == {k: (k, 0 if k < 20 else (1 if k < 30 else 3), k)
                        for k in range(35)}

    def test_without_tracking_drop_is_a_hard_stop(self, spark, events,
                                                  tmp_path):
        """No schemaTrackingLocation: a stream planned on the latest schema
        (post-DROP) hits the creation commit's metadata — which carries a
        physical column the plan cannot represent — and stops hard; the
        same setup with a tracking location is the recoverable case above."""
        from pyspark.sql.streaming import StreamingQueryException

        spark.dataSource.register(SharedTableDataSource)
        d = str(tmp_path / "st_plain")
        log = TableLog(spark, d)
        log.create(events.select("event_id", "event_type", "value")
                   .filter("event_id < 50"), name="stp")
        log.enable_column_mapping()
        log.drop_column("value")
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        with pytest.raises(StreamingQueryException) as exc:
            import uuid

            q = (spark.readStream.format("deltashare").option("path", d)
                 .option("startingVersion", "0")
                 .load()
                 .writeStream.format("parquet").option("path", out_dir)
                 .option("checkpointLocation", ckpt)
                 .queryName(f"stp_{uuid.uuid4().hex[:6]}")
                 .start())
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        assert "incompatible schema change" in str(exc.value)


class TestStreamingOps:
    """Streaming operators (streaming/ops.py) over the deltashare source:
    built-in stateful primitives (dedup state store, session_window,
    tumbling windows) — not hand-rolled state."""

    def _drain(self, df, tmp_path, name):
        # processingTime trigger (not availableNow): append-mode stateful
        # output flushes in the no-data batch AFTER the watermark advances,
        # which the single-batch availableNow fallback never runs
        q = (df.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        q.stop()
        return df.sparkSession.table(name)

    def test_stream_dedup_first_seen(self, spark, events, tmp_path):
        from delta_sharing_spark.streaming.ops import stream_dedup

        src = str(tmp_path / "src")
        # duplicate every event: two appends of the same rows
        log = TableLog(spark, src)
        log.create(events.limit(200), name="src")
        log.append(events.limit(200))
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0").load())
        out = self._drain(stream_dedup(stream, ["event_id", "event_type"]),
                          tmp_path, "dedup_out")
        assert out.count() == 200  # every duplicate dropped, each key once
        assert out.select("event_id").distinct().count() == 200

    def test_stream_sessionize_gap_windows(self, spark, events, tmp_path):
        from delta_sharing_spark.streaming.ops import stream_sessionize

        src = str(tmp_path / "src2")
        TableLog(spark, src).create(events, name="src")
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0").load())
        sess = stream_sessionize(stream, "user_id", "ts",
                                 gap="30 minutes", watermark="0 seconds")
        out = self._drain(sess, tmp_path, "sess_out")
        rows = out.collect()
        assert rows  # sessions closed once the stream drained
        # session invariants: bounds ordered, counts positive, and the
        # batch twin (window + 30min gap semantics) agrees on totals
        assert all(r["session_start"] <= r["session_end"] for r in rows)
        assert sum(r["n_events"] for r in rows) <= events.count()
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        # no overlapping sessions per user (gap semantics)
        for user_rows in by_user.values():
            user_rows.sort(key=lambda r: r["session_start"])
            for a, b in zip(user_rows, user_rows[1:]):
                assert a["session_end"] <= b["session_start"]

    def test_stream_hourly_counts(self, spark, events, tmp_path):
        from delta_sharing_spark.streaming.ops import stream_hourly_counts

        src = str(tmp_path / "src3")
        TableLog(spark, src).create(events, name="src")
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0").load())
        counts = stream_hourly_counts(stream, "ts", group_col="event_type",
                                      watermark="0 seconds")
        out = self._drain(counts, tmp_path, "hourly_out")
        # finalized windows must agree exactly with the batch computation
        batch = (events.groupBy(F.window("ts", "1 hour"), "event_type")
                 .count())
        got = sum(r["n"] for r in out.collect())
        assert 0 < got <= events.count()
        assert out.count() <= batch.count()

    def test_stream_lsh_tws_gate_without_protobuf(self, spark, events,
                                                  stream_table):
        # without protobuf the TWS runtime crashes opaquely at query start;
        # the operator must fail fast at construction with a clear pointer
        from delta_sharing_spark.streaming.ops import (
            _no_protobuf,
            stream_lsh_dedup_candidates_tws,
        )

        if not _no_protobuf():
            pytest.skip("protobuf installed; gate inactive")
        stream = (spark.readStream.format("deltashare")
                  .option("path", stream_table).load()
                  .selectExpr("event_id AS doc_id",
                              "event_type AS text"))
        with pytest.raises(NotImplementedError, match="protobuf"):
            stream_lsh_dedup_candidates_tws(stream, "doc_id", "text")

    @pytest.mark.parametrize("variant", ["apiws", "tws"])
    def test_stream_lsh_dedup_matches_batch(self, spark, tmp_path, variant):
        """Streaming LSH dedup (both the applyInPandasWithState operator
        and its transformWithStateInPandas port): candidates emitted
        across micro-batches must equal the BATCH LSH candidate set on the
        same docs (identical md5 math), with pairs crossing batch
        boundaries only discoverable via bucket state."""
        from delta_sharing_spark.operators.dedup import (
            minhash_lsh_candidates,
            minhash_signatures,
        )
        from delta_sharing_spark.streaming.ops import (
            stream_lsh_dedup_candidates,
            stream_lsh_dedup_candidates_tws,
        )

        if variant == "tws":
            from delta_sharing_spark.streaming.ops import _no_protobuf

            if _no_protobuf():
                pytest.skip("transformWithStateInPandas needs protobuf "
                            "(state-server protocol), not installed here")
        op = (stream_lsh_dedup_candidates if variant == "apiws"
              else stream_lsh_dedup_candidates_tws)
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = "the quick brown fox jumps over the lazy cat again and again"
        far = "completely different words appear in this sentence here ok"
        docs = spark.createDataFrame(
            [(0, base), (1, near), (2, far), (3, base)],
            "doc_id long, text string")
        src = str(tmp_path / "lsh_src")
        log = TableLog(spark, src)
        # two commits -> multiple micro-batches; pair (0,3) spans batches
        log.create(docs.filter("doc_id < 2"), name="docs")
        log.append(docs.filter("doc_id >= 2"))
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0")
                  .option("maxFilesPerTrigger", "1").load())
        cand = op(stream, "doc_id", "text")
        q = (cand.writeStream.format("memory")
             .queryName(f"lsh_out_{variant}")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck_lsh"))
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        q.stop()
        got = {tuple(sorted((r["new_id"], r["seen_id"])))
               for r in spark.table(f"lsh_out_{variant}").collect()}
        sigs = minhash_signatures(docs, "doc_id", "text")
        want = {tuple(sorted((r["id_a"], r["id_b"])))
                for r in minhash_lsh_candidates(sigs, "doc_id").collect()}
        assert got == want
        assert (0, 3) in got  # the cross-batch pair came from bucket state


class TestStreamMergeSink:
    def test_upsert_sink_converges_to_latest_values(self, spark, events,
                                                    tmp_path):
        """mode='merge' sink: a stream of keyed change rows maintains the
        target by upsert — duplicates across batches collapse to one row
        per key with the latest value winning within a batch sequence."""
        from delta_sharing_spark.streaming.sink import write_stream_to_table

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        ck = str(tmp_path / "ck")
        base = events.limit(100).select("event_id", "user_id", "value")
        log = TableLog(spark, src)
        log.create(base, name="src")
        # second commit re-sends 30 keys with value + 1000 (an update wave)
        log.append(base.filter("event_id < 30")
                   .withColumn("value", F.col("value") + 1000))
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0")
                  .option("maxFilesPerTrigger", "1").load())
        q = write_stream_to_table(
            stream, dst, ck, mode="merge", merge_keys=["event_id"],
            trigger={"processingTime": "200 milliseconds"})
        q.processAllAvailable()
        q.stop()
        out = SharedTable(spark, dst).to_df()
        assert out.count() == 100  # one row per key
        assert out.filter("value >= 1000").count() == 30  # updates won
        # restart is a no-op (epochs already committed)
        stream2 = (spark.readStream.format("deltashare").option("path", src)
                   .option("startingVersion", "0")
                   .option("maxFilesPerTrigger", "1").load())
        q2 = write_stream_to_table(
            stream2, dst, ck, mode="merge", merge_keys=["event_id"],
            trigger={"processingTime": "200 milliseconds"})
        q2.processAllAvailable()
        q2.stop()
        assert SharedTable(spark, dst).to_df().count() == 100


class TestStreamDedupKeyCollision:
    def test_concat_collision_rows_both_survive(self, spark, tmp_path):
        from delta_sharing_spark.streaming.ops import stream_dedup

        src = str(tmp_path / "coll_src")
        df = spark.createDataFrame(
            [(12, "3x", 1.0), (1, "23x", 2.0)],
            "event_id long, event_type string, value double")
        TableLog(spark, src).create(df, name="src")
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare").option("path", src)
                  .option("startingVersion", "0").load())
        q = (stream_dedup(stream, ["event_id", "event_type"])
             .writeStream.format("memory").queryName("coll_out")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck_coll"))
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        # "12"+"3x" and "1"+"23x" concatenate identically; both distinct
        # rows must survive with the json-struct key
        assert spark.table("coll_out").count() == 2


class TestStreamingReviewRegressions:
    def test_ignore_deletes_does_not_mask_updates(self, spark, events,
                                                  tmp_path):
        """ignoreDeletes tolerates delete-ONLY commits; an UPDATE commit
        (removes+adds) still errors without ignoreChanges
        (DeltaSharingSource.scala:994-1035 semantics)."""
        src = str(tmp_path / "t")
        log = TableLog(spark, src)
        log.create(events.limit(100), name="t")
        log.update({"value": "value + 1"}, "event_id < 10")  # update commit
        r = SharedTableStreamReader(
            {"path": src, "startingversion": "0",
             "ignoredeletes": "true"}, None)
        with pytest.raises(ValueError, match="ignoreChanges"):
            r._file_sequence(0)
        # delete-ONLY commit (whole partition dropped, no rewritten
        # adds) passes with ignoreDeletes
        src2 = str(tmp_path / "t2")
        log2 = TableLog(spark, src2)
        log2.create(events, partition_by=["event_type"], name="t")
        log2.delete("event_type = 'click'")
        r2 = SharedTableStreamReader(
            {"path": src2, "startingversion": "0",
             "ignoredeletes": "true"}, None)
        assert r2._file_sequence(0)

    def test_expired_starting_version_raises(self, spark, events, tmp_path):
        src = str(tmp_path / "t")
        log = TableLog(spark, src)
        batch = events.limit(5)
        log.create(batch, name="t",
                   configuration={"checkpointInterval": "10"})
        for _ in range(24):
            log.append(batch)
        log.expire_log(keep_last=5)
        r = SharedTableStreamReader({"path": src, "startingversion": "0"},
                                    None)
        with pytest.raises(ValueError, match="expired"):
            r._file_sequence(0)

    def test_time_travel_schema_matches_version(self, spark, events,
                                                tmp_path):
        """Batch time travel plans on the schema AT that version, not the
        evolved latest schema."""
        src = str(tmp_path / "t")
        log = TableLog(spark, src)
        log.create(events.select("event_id", "event_type"), name="t")
        log.update_metadata(schema=T.StructType([
            T.StructField("event_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("extra", T.StringType(), True),
        ]))
        spark.dataSource.register(SharedTableDataSource)
        v0 = (spark.read.format("deltashare").option("path", src)
              .option("version", "0").load())
        assert v0.columns == ["event_id", "event_type"]
        latest = spark.read.format("deltashare").option("path", src).load()
        assert latest.columns == ["event_id", "event_type", "extra"]
        assert latest.filter("extra IS NULL").count() == latest.count()

    def test_schema_after_expiry_uses_checkpoint(self, spark, events,
                                                 tmp_path):
        src = str(tmp_path / "t")
        log = TableLog(spark, src)
        batch = events.limit(5)
        log.create(batch, name="t",
                   configuration={"checkpointInterval": "10"})
        for _ in range(24):
            log.append(batch)
        log.expire_log(keep_last=5)  # metadata commit (v0) is gone
        spark.dataSource.register(SharedTableDataSource)
        df = spark.read.format("deltashare").option("path", src).load()
        assert df.count() == 25 * 5

    def test_batch_cdf_supported(self, spark, events, tmp_path):
        """Round-5 change: batch readChangeFeed is a real reader now
        (TestBatchCDFReader covers semantics) — the old clear-error
        contract is gone; a plain read must succeed."""
        src = str(tmp_path / "t")
        TableLog(spark, src).create(
            events.limit(10), name="t",
            configuration={"enableChangeDataFeed": "true"})
        spark.dataSource.register(SharedTableDataSource)
        out = (spark.read.format("deltashare").option("path", src)
               .option("readChangeFeed", "true")
               .option("startingVersion", "0").load())
        assert out.count() == 10
        assert "_change_type" in out.columns

    def test_timestamp_partition_round_trip(self, spark, tmp_path):
        """Hive-escaped partition dirs (':' -> %3A) must round-trip: the
        recorded partitionValues carry the logical value."""
        src = str(tmp_path / "t")
        df = spark.sql("""
            SELECT id AS k, CAST('2024-01-0' || (id + 1) || ' 10:30:00'
                                 AS TIMESTAMP) AS ts_part
            FROM range(3)
        """)
        log = TableLog(spark, src)
        log.create(df, partition_by=["ts_part"], name="t")
        snap = log.snapshot()
        assert all("%" not in a.partitionValues["ts_part"]
                   for a in snap.files)
        spark.dataSource.register(SharedTableDataSource)
        out = (spark.read.format("deltashare").option("path", src).load())
        assert out.count() == 3
        assert out.filter("ts_part = '2024-01-01 10:30:00'").count() == 1


class TestDataSourceCloneAndPaths:
    """Round-4 review findings: the Python Data Source must apply a
    shallow clone's carried source deletion vectors (dv_keys matches
    both relative and absolute DV row keys), and special-character table
    paths must round-trip the URI-encoded _metadata.file_path."""

    def test_datasource_reads_clone_with_source_dv(self, spark, events,
                                                   tmp_path):
        from delta_sharing_spark.plans.log import TableLog
        from delta_sharing_spark.sources.datasource import (
            SharedTableDataSource,
        )

        src = TableLog(spark, str(tmp_path / "src"))
        src.create(events.filter("event_id < 100"), name="src",
                   configuration={"enableDeletionVectors": "true"})
        src.delete("event_id < 25")
        clone = src.clone_to(str(tmp_path / "clone"))
        spark.dataSource.register(SharedTableDataSource)
        got = (spark.read.format("deltashare")
               .option("path", clone.path).load().count())
        assert got == 75
        # clone-side DV stacking visible through the datasource too
        clone.delete("event_id < 40")
        got2 = (spark.read.format("deltashare")
                .option("path", clone.path).load().count())
        assert got2 == 60

    def test_special_char_table_path_dml(self, spark, events, tmp_path):
        """Table rooted under a directory with a space and a percent sign:
        DV deletes and DML file matching must still work (the scanned
        _metadata.file_path is URI-encoded and is now url-decoded before
        comparison)."""
        from delta_sharing_spark.plans.log import TableLog
        from delta_sharing_spark.table import SharedTable

        d = str(tmp_path / "space dir" / "pct%25dir" / "t")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 100"), name="t",
                   configuration={"enableDeletionVectors": "true"})
        log.delete("event_id < 30")
        assert SharedTable(spark, d).to_df().count() == 70
        log.update({"value": "value + 1000"}, "event_id >= 90")
        assert SharedTable(spark, d).to_df() \
            .filter("value >= 1000").count() == 10

    def test_special_char_path_rewrite_dml(self, spark, events, tmp_path):
        from delta_sharing_spark.plans.log import TableLog
        from delta_sharing_spark.table import SharedTable

        d = str(tmp_path / "plus+dir" / "t")
        log = TableLog(spark, d)
        log.create(events.filter("event_id < 80"), name="t")
        v = log.delete("event_id < 20")
        assert v == 1
        assert SharedTable(spark, d).to_df().count() == 60
        info = log.read_commit(1).info
        assert info.operationMetrics["numDeletedRows"] == "20"


class TestSinkInheritsTableInvariants:
    """The streaming sink writes through TableLog.append, so CHECK
    constraints and generated columns apply to streamed batches with no
    extra sink code — make that inheritance explicit."""

    def test_sink_enforces_constraint_and_derives_generated(
            self, spark, events, tmp_path):
        from delta_sharing_spark.plans.log import TableLog
        from delta_sharing_spark.streaming.sink import write_stream_to_table
        from delta_sharing_spark.table import SharedTable

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        TableLog(spark, src).create(events.filter("event_id < 60"),
                                    name="src")
        # sink table pre-created with a constraint AND a generated column;
        # the stream carries neither the generated column nor violations
        dst_log = TableLog(spark, dst)
        dst_log.create(
            events.filter("event_id < 0"),  # empty seed, schema only
            name="dst",
            configuration={"delta.constraints.v_ok": "value >= 0"},
            generated_columns={"event_date": "CAST(ts AS DATE)"})
        spark.dataSource.register(SharedTableDataSource)
        stream = (spark.readStream.format("deltashare")
                  .option("path", src).option("startingVersion", "0")
                  .load())
        q = write_stream_to_table(
            stream, dst, str(tmp_path / "ck"),
            trigger={"availableNow": True})
        q.awaitTermination(120)
        df = SharedTable(spark, dst).to_df()
        assert df.count() == 60
        assert "event_date" in df.columns
        assert df.filter("event_date <> CAST(ts AS DATE)").count() == 0


class TestStreamSinkIdentity:
    def test_stream_append_allocates_identity(self, spark, events, tmp_path):
        """Streaming into a pre-created GENERATED ALWAYS AS IDENTITY table:
        every micro-batch append allocates unique values past the mark in
        the same atomic commit as its epoch stamp, and a checkpoint
        restart neither duplicates rows nor re-allocates."""
        from delta_sharing_spark.streaming.sink import write_stream_to_table
        from delta_sharing_spark.table import SharedTable

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        ckpt = str(tmp_path / "ck")
        TableLog(spark, src).create(events.filter("event_id < 120"),
                                    name="src")
        TableLog(spark, dst).create(
            events.filter("event_id < 0")
            .select("event_id", "event_type", "value"),
            name="dst", identity_columns={"rid": {"start": 1, "step": 1}})
        spark.dataSource.register(SharedTableDataSource)

        def run():
            stream = (spark.readStream.format("deltashare")
                      .option("path", src).option("startingVersion", "0")
                      .option("maxFilesPerTrigger", "2").load()
                      .select("event_id", "event_type", "value"))
            q = write_stream_to_table(
                stream, dst, ckpt,
                trigger={"processingTime": "200 milliseconds"})
            q.processAllAvailable()
            q.stop()

        run()
        t = SharedTable(spark, dst)
        rids = [r.rid for r in t.to_df().select("rid").collect()]
        assert len(rids) == 120 and len(set(rids)) == 120
        assert min(rids) == 1 and max(rids) == 120
        run()  # restart: replayed epochs skipped, no re-allocation
        rids2 = [r.rid for r in t.to_df().select("rid").collect()]
        assert sorted(rids2) == sorted(rids)
