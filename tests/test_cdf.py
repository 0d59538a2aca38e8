"""CDF semantics against a scripted history — the reference's F6 golden
shape (cdf_table_cdf_enabled: inserts, delete, update ->
insert/delete/update_preimage/update_postimage rows;
test_delta_sharing.py:1380-1440)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_sharing_spark.cdf import CDFError, table_changes
from delta_sharing_spark.plans.log import TableLog


@pytest.fixture()
def cdf_table(spark, table_dir):
    rows = [("1", 1, "2020-01-01"), ("2", 2, "2020-01-01"),
            ("3", 3, "2020-01-01")]
    df = spark.createDataFrame(rows, "name string, age int, birthday string") \
        .withColumn("birthday", F.col("birthday").cast("date"))
    log = TableLog(spark, table_dir)
    log.create(df, name="cdf_table",
               configuration={"enableChangeDataFeed": "true"})
    log.delete("name = '3'")
    log.update({"birthday": "cast('2020-02-02' as date)"}, "name = '2'")
    return table_dir


class TestCDF:
    def test_golden_change_rows(self, spark, cdf_table):
        ch = table_changes(spark, cdf_table, starting_version=0)
        got = sorted(
            (r["name"], r["_change_type"], r["_commit_version"],
             str(r["birthday"]))
            for r in ch.collect()
        )
        assert got == sorted([
            ("1", "insert", 0, "2020-01-01"),
            ("2", "insert", 0, "2020-01-01"),
            ("3", "insert", 0, "2020-01-01"),
            ("3", "delete", 1, "2020-01-01"),
            ("2", "update_preimage", 2, "2020-01-01"),
            ("2", "update_postimage", 2, "2020-02-02"),
        ])

    def test_range_windows(self, spark, cdf_table):
        ch01 = table_changes(spark, cdf_table, starting_version=0,
                             ending_version=1)
        assert ch01.count() == 4  # 3 inserts + 1 delete
        ch22 = table_changes(spark, cdf_table, starting_version=2)
        assert set(r["_change_type"] for r in ch22.collect()) == {
            "update_preimage", "update_postimage"}

    def test_start_after_latest_errors(self, spark, cdf_table):
        with pytest.raises(CDFError):
            table_changes(spark, cdf_table, starting_version=9)

    def test_empty_range_errors(self, spark, cdf_table):
        with pytest.raises(CDFError):
            table_changes(spark, cdf_table, starting_version=2,
                          ending_version=1)

    def test_cdf_disabled_errors(self, spark, events, tmp_path):
        d = str(tmp_path / "nocdf")
        TableLog(spark, d).create(events.limit(10))
        with pytest.raises(CDFError):
            table_changes(spark, d, starting_version=0)

    def test_timestamp_range(self, spark, cdf_table):
        log = TableLog(spark, cdf_table)
        t1 = log.read_commit(1).timestamp
        # exact-match start resolves to that commit (else earliest after)
        ch = table_changes(spark, cdf_table, starting_timestamp=t1)
        assert set(r["_commit_version"] for r in ch.collect()) == {1, 2}

    def test_commit_timestamp_column(self, spark, cdf_table):
        log = TableLog(spark, cdf_table)
        ch = table_changes(spark, cdf_table, starting_version=1,
                           ending_version=1)
        assert ch.select("_commit_timestamp").distinct().collect()[0][0] \
            == log.read_commit(1).timestamp


class TestCDFSchemaEvolution:
    """Schema changes inside the range: each file reads under its own
    epoch's schema, surfaced as the latest logical schema
    (PROTOCOL.md:2352-2420; reader.py:477-592 per-version metadata)."""

    @pytest.fixture()
    def evolved(self, spark, table_dir):
        from pyspark.sql import types as T

        df = spark.createDataFrame(
            [(1, 10), (2, 20)], "id long, score int")
        log = TableLog(spark, table_dir)
        log.create(df, name="evolved",
                   configuration={"enableChangeDataFeed": "true"})
        log.enable_column_mapping()                      # v1
        log.rename_column("score", "points")             # v2
        log.update({"points": "points + 1"}, "id = 1")   # v3 (cdc files)
        snap = log.snapshot()
        widened = T.StructType([
            T.StructField(f.name,
                          T.LongType() if f.name == "points" else f.dataType,
                          f.nullable, f.metadata)
            for f in snap.schema.fields])
        log.update_metadata(schema=widened)              # v4
        log.append(spark.createDataFrame(
            [(3, 30)], "id long, points long"))          # v5
        return table_dir

    def test_rename_and_widen_across_range(self, spark, evolved):
        ch = table_changes(spark, evolved, starting_version=0)
        assert dict(ch.dtypes)["points"] == "bigint"
        got = sorted((r["id"], r["points"], r["_change_type"])
                     for r in ch.collect())
        assert got == sorted([
            (1, 10, "insert"), (2, 20, "insert"),       # v0 files: score int
            (1, 10, "update_preimage"),                  # v3 cdc: score int
            (1, 11, "update_postimage"),
            (3, 30, "insert"),                           # v5 file: long
        ])

    def test_column_added_mid_range_nulls_backfill(self, spark, evolved):
        from pyspark.sql import types as T

        log = TableLog(spark, evolved)
        snap = log.snapshot()
        widened = T.StructType(
            list(snap.schema.fields)
            + [T.StructField("tag", T.StringType(), True)])
        log.update_metadata(schema=widened)              # v6
        log.append(spark.createDataFrame(
            [(4, 40, "new")], "id long, points long, tag string"))  # v7
        ch = table_changes(spark, evolved, starting_version=0)
        tags = {r["id"]: r["tag"] for r in ch.collect()
                if r["_change_type"] == "insert"}
        assert tags == {1: None, 2: None, 3: None, 4: "new"}

    def test_range_before_later_change_uses_end_schema(self, spark,
                                                       evolved):
        """A schema change AFTER the queried range must not affect it:
        the output schema is the END-of-range snapshot's (delta-kernel
        TableChangesScanBuilder semantics — compatibility required within
        [start, end] only)."""
        from pyspark.sql import types as T

        latest_before = TableLog(spark, evolved).latest_version()
        log = TableLog(spark, evolved)
        snap = log.snapshot()
        narrowed = T.StructType([
            T.StructField(f.name,
                          T.IntegerType() if f.name == "points"
                          else f.dataType,
                          f.nullable, f.metadata)
            for f in snap.schema.fields])
        log.update_metadata(schema=narrowed)  # AFTER the queried range
        ch = table_changes(spark, evolved, starting_version=0,
                           ending_version=latest_before)
        assert dict(ch.dtypes)["points"] == "bigint"  # end-of-range schema
        got = sorted((r["id"], r["points"], r["_change_type"])
                     for r in ch.collect())
        assert (3, 30, "insert") in got and (1, 11,
                                             "update_postimage") in got

    def test_incompatible_narrowing_errors(self, spark, evolved):
        from pyspark.sql import types as T

        log = TableLog(spark, evolved)
        snap = log.snapshot()
        narrowed = T.StructType([
            T.StructField(f.name,
                          T.IntegerType() if f.name == "points"
                          else f.dataType,
                          f.nullable, f.metadata)
            for f in snap.schema.fields])
        log.update_metadata(schema=narrowed)
        log.append(spark.createDataFrame(
            [(5, 50)], "id long, points int"))
        with pytest.raises(CDFError, match="incompatible schema change"):
            table_changes(spark, evolved, starting_version=0).collect()
        # a range that stays inside one epoch still reads fine
        latest = TableLog(spark, evolved).latest_version()
        assert table_changes(spark, evolved,
                             starting_version=latest).count() == 1


class TestCDFActions:
    def test_action_stream(self, spark, cdf_table):
        from delta_sharing_spark.cdf import table_changes_actions

        out = table_changes_actions(spark, cdf_table, starting_version=0)
        kinds = [next(iter(line)) for line in out["actions"]]
        assert kinds[0] == "protocol" and kinds[1] == "metaData"
        assert "add" in kinds and "cdf" in kinds
        cdfs = [line["cdf"] for line in out["actions"] if "cdf" in line]
        assert {c["version"] for c in cdfs} == {1, 2}

    def test_historical_metadata(self, spark, cdf_table):
        from delta_sharing_spark.cdf import table_changes_actions

        out = table_changes_actions(spark, cdf_table, starting_version=0,
                                    include_historical_metadata=True)
        metas = [line["metaData"] for line in out["actions"]
                 if "metaData" in line]
        assert len(metas) == 2  # current + v0 historical
        assert metas[1]["version"] == 0


def test_delta_prefixed_cdf_property(spark, events, tmp_path):
    """delta.enableChangeDataFeed (Delta's property spelling) enables CDF
    end to end: cdc files are written on DELETE and table_changes serves
    them."""
    from delta_sharing_spark.cdf import table_changes
    from delta_sharing_spark.plans.log import TableLog

    d = str(tmp_path / "t")
    log = TableLog(spark, d)
    log.create(events.limit(30), name="t",
               configuration={"delta.enableChangeDataFeed": "true"})
    log.delete("event_id < 3")
    ch = table_changes(spark, d, starting_version=1)
    assert ch.filter("_change_type = 'delete'").count() == 3
