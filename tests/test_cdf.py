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
        assert len(metas) == 2  # head (start snapshot) + v0 historical
        assert metas[1]["version"] == 0

    def test_head_metadata_snapshot_choice(self, spark, tmp_path):
        """Reference semantics (DeltaSharedTable.scala:735-739): the head
        metaData of the changes RPC is the range-START snapshot's when
        includeHistoricalMetadata=true (clients seed the CDF read schema
        from it; in-range changes arrive as historical lines), else the
        LATEST snapshot's — never the end-of-range snapshot's."""
        from delta_sharing_spark.cdf import table_changes_actions
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(2).selectExpr("id AS k").coalesce(1),
                   name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.append(spark.range(2, 4).selectExpr("id AS k").coalesce(1))
        log.enable_column_mapping()  # v2: metadata commit
        log.append(spark.range(4, 6).selectExpr("id AS k").coalesce(1))

        def head_meta(out):
            return next(ln["metaData"] for ln in out["actions"]
                        if "metaData" in ln)

        latest_v = log.latest_version()
        out = table_changes_actions(spark, d, starting_version=0,
                                    ending_version=1)
        assert head_meta(out)["version"] == latest_v
        out = table_changes_actions(spark, d, starting_version=0,
                                    ending_version=1,
                                    include_historical_metadata=True)
        assert head_meta(out)["version"] == 0


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


class TestCDFPagination:
    """queryCDF pagination parity (DeltaSharedTable.scala:707-723,766-780):
    checksummed tokens bound to the query parameters, the range end pinned
    at the first page, concatenated pages identical to the unpaged
    response, nextPageToken delivered in an endStreamAction trailer."""

    @pytest.fixture()
    def deep_cdf(self, spark, tmp_path):
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(4).selectExpr("id AS k").coalesce(1),
                   name="t",
                   configuration={"enableChangeDataFeed": "true"})
        for i in range(1, 5):
            log.append(spark.range(i * 10, i * 10 + 2)
                       .selectExpr("id AS k").coalesce(1))
        return d, log

    def _files(self, out):
        return [ln for ln in out["actions"]
                if any(k in ln for k in ("add", "cdf", "remove"))]

    def test_pages_concatenate_to_full(self, spark, deep_cdf):
        from delta_sharing_spark.cdf import table_changes_actions

        d, _log = deep_cdf
        full = table_changes_actions(spark, d, starting_version=0)
        assert full["nextPageToken"] is None
        pages, token = [], None
        for _ in range(20):
            out = table_changes_actions(spark, d, starting_version=0,
                                        max_files=2, page_token=token)
            pages += self._files(out)
            token = out["nextPageToken"]
            if token is None:
                break
        assert pages == self._files(full)
        # head protocol/metaData repeat on every page
        out = table_changes_actions(spark, d, starting_version=0,
                                    max_files=2)
        assert "protocol" in out["actions"][0]
        assert "metaData" in out["actions"][1]

    def test_boundary_metadata_not_duplicated(self, spark, tmp_path):
        """A historical metaData line sitting at a page boundary belongs
        to the page carrying its neighbouring files — concatenated pages
        must equal the unpaged response (review finding: the line was
        emitted on the filled page AND re-emitted on the next)."""
        from delta_sharing_spark.cdf import table_changes_actions
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(2).selectExpr("id AS k").coalesce(1),
                   name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.append(spark.range(2, 4).selectExpr("id AS k").coalesce(1))
        log.enable_column_mapping()  # v2: metadata-only commit
        log.append(spark.range(4, 6).selectExpr("id AS k").coalesce(1))

        def metas(out):
            return [ln["metaData"].get("version") for ln in out["actions"]
                    if "metaData" in ln][1:]  # drop the head line

        full = table_changes_actions(spark, d, starting_version=0,
                                     include_historical_metadata=True)
        pages, token = [], None
        while True:
            out = table_changes_actions(
                spark, d, starting_version=0,
                include_historical_metadata=True,
                max_files=2, page_token=token)
            pages += metas(out)
            token = out["nextPageToken"]
            if token is None:
                break
        assert pages == metas(full), \
            f"paged historical metaData {pages} != unpaged {metas(full)}"

    def test_trailing_metadata_after_exactly_full_page(self, spark,
                                                       tmp_path):
        """An exactly-full page followed only by metadata-only commits
        must still mint a continuation token so the trailing historical
        metaData reaches the client on the next page (advice finding:
        emit_meta skipped them once emitted >= max_files, but no token was
        ever minted — paged walks silently missed a schema-change
        commit)."""
        from delta_sharing_spark.cdf import table_changes_actions
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(2).selectExpr("id AS k").coalesce(1),
                   name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.append(spark.range(2, 4).selectExpr("id AS k").coalesce(1))
        log.enable_column_mapping()  # v2: trailing metadata-only commit

        def metas(out):
            return [ln["metaData"].get("version") for ln in out["actions"]
                    if "metaData" in ln][1:]  # drop the head line

        full = table_changes_actions(spark, d, starting_version=0,
                                     include_historical_metadata=True)
        pages, files, token = [], 0, None
        for _ in range(10):
            out = table_changes_actions(
                spark, d, starting_version=0,
                include_historical_metadata=True,
                max_files=2,  # v0+v1 write exactly 2 files -> full page
                page_token=token)
            pages += metas(out)
            files += sum(1 for ln in out["actions"]
                         if any(k in ln for k in ("add", "cdf", "remove")))
            token = out["nextPageToken"]
            if token is None:
                break
        assert token is None
        assert files == 2
        assert pages == metas(full), \
            f"paged historical metaData {pages} != unpaged {metas(full)}"

    def test_token_bound_to_table(self, spark, tmp_path):
        """A page token minted for one table must not validate against
        another table queried with the same parameters (the reference
        binds tableConfig.id into the token checksum)."""
        from delta_sharing_spark.cdf import table_changes_actions
        from delta_sharing_spark.plans.log import TableLog

        dirs = []
        for name in ("a", "b"):
            d = str(tmp_path / name)
            log = TableLog(spark, d)
            log.create(spark.range(4).selectExpr("id AS k").coalesce(1),
                       name=name,
                       configuration={"enableChangeDataFeed": "true"})
            log.append(spark.range(4, 6).selectExpr("id AS k")
                       .coalesce(1))
            dirs.append(d)
        out = table_changes_actions(spark, dirs[0], starting_version=0,
                                    max_files=1)
        with pytest.raises(ValueError, match="different query parameters"):
            table_changes_actions(spark, dirs[1], starting_version=0,
                                  max_files=1,
                                  page_token=out["nextPageToken"])

    def test_token_bound_to_params(self, spark, deep_cdf):
        from delta_sharing_spark.cdf import table_changes_actions

        d, _log = deep_cdf
        out = table_changes_actions(spark, d, starting_version=0,
                                    max_files=1)
        token = out["nextPageToken"]
        with pytest.raises(ValueError, match="different query parameters"):
            table_changes_actions(spark, d, starting_version=1,
                                  max_files=1, page_token=token)

    def test_deep_pages_parse_o_page_commits(self, spark, tmp_path,
                                             monkeypatch):
        """Page tokens carry the resume VERSION, so a page at offset k
        parses O(page) commits, never the O(k) commits before it (the
        reference's tokens pair version + startingActionIndex). Verified
        by counting read_commit calls per page over a 30-commit backlog —
        and the paged walk must still concatenate to the unpaged
        response."""
        from delta_sharing_spark.cdf import table_changes_actions
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(1).selectExpr("id AS k").coalesce(1),
                   name="t",
                   configuration={"enableChangeDataFeed": "true",
                                  "checkpointInterval": "0"})
        for i in range(1, 30):
            log.append(spark.range(i, i + 1).selectExpr("id AS k")
                       .coalesce(1))

        calls = {"n": 0}
        orig = TableLog.read_commit

        def counting(self, version):
            calls["n"] += 1
            return orig(self, version)

        monkeypatch.setattr(TableLog, "read_commit", counting)
        full = table_changes_actions(spark, d, starting_version=0)
        files, token, per_page = [], None, []
        for _ in range(40):
            calls["n"] = 0
            out = table_changes_actions(spark, d, starting_version=0,
                                        max_files=2, page_token=token)
            per_page.append(calls["n"])
            files += [ln for ln in out["actions"]
                      if any(k in ln for k in ("add", "cdf", "remove"))]
            token = out["nextPageToken"]
            if token is None:
                break
        assert files == [ln for ln in full["actions"]
                         if any(k in ln for k in ("add", "cdf", "remove"))]
        # snapshot resolution reads a handful of commits; the page walk
        # itself must stay bounded by the page (2 files -> ~3 commits),
        # never grow with the offset. Without the resume version, page 15
        # parses ~30 commits.
        assert max(per_page[2:]) <= per_page[1] + 2, per_page

    def test_range_deep_pages_parse_o_page_commits(self, spark, tmp_path,
                                                   monkeypatch):
        """Range-form twin: query_actions(starting_version=...) pages
        resume at their token's version."""
        from delta_sharing_spark.plans.log import TableLog
        from delta_sharing_spark.table import SharedTable

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(1).selectExpr("id AS k").coalesce(1),
                   name="t", configuration={"checkpointInterval": "0"})
        for i in range(1, 30):
            log.append(spark.range(i, i + 1).selectExpr("id AS k")
                       .coalesce(1))
        t = SharedTable(spark, d)

        calls = {"n": 0}
        orig = TableLog.read_commit

        def counting(self, version):
            calls["n"] += 1
            return orig(self, version)

        monkeypatch.setattr(TableLog, "read_commit", counting)
        full = t.query_actions(starting_version=0)
        adds = [ln for ln in full["actions"] if "add" in ln]
        pages, token, per_page = [], None, []
        for _ in range(40):
            calls["n"] = 0
            out = t.query_actions(starting_version=0, max_files=2,
                                  page_token=token)
            per_page.append(calls["n"])
            pages += [ln for ln in out["actions"] if "add" in ln]
            token = out["nextPageToken"]
            if token is None:
                break
        assert pages == adds
        assert max(per_page[2:]) <= per_page[1] + 2, per_page

    def test_resume_version_expired_mid_pagination_fails_loudly(
            self, spark, deep_cdf):
        """expire_log between pages removes the token's resume version:
        the next page must fail with an explicit error, not silently skip
        the unserved file actions that lived in the expired commits.
        Here the retention-floor check fires first (the range start is
        itself expired); ActionPager.check_resume_available remains the
        backstop for non-prefix gaps (manual log surgery). Every range
        error on the changes form — including the pager's — surfaces as
        CDFError, so the wire layer maps them to one status (r10)."""
        from delta_sharing_spark.cdf import CDFError, table_changes_actions

        d, log = deep_cdf
        page1 = table_changes_actions(spark, d, starting_version=0,
                                      max_files=1)
        token = page1["nextPageToken"]
        assert token
        log.write_checkpoint()
        expired = log.expire_log(keep_last=1)
        assert 0 in expired, "fixture must expire the resume version"
        with pytest.raises(CDFError, match="expired from the log"):
            table_changes_actions(spark, d, starting_version=0,
                                  max_files=1, page_token=token)
        # a FIRST page from below the floor fails loudly too (the silent
        # truncation the round-9 review flagged)
        with pytest.raises(CDFError, match="earliest retained"):
            table_changes_actions(spark, d, starting_version=0)

    def test_end_pinned_across_pages(self, spark, deep_cdf):
        from delta_sharing_spark.cdf import table_changes_actions

        d, log = deep_cdf
        out = table_changes_actions(spark, d, starting_version=0,
                                    max_files=2)
        token = out["nextPageToken"]
        # a commit landing mid-pagination is ignored by later pages
        log.append(spark.range(99, 101).selectExpr("id AS k").coalesce(1))
        pages = self._files(out)
        while token is not None:
            out = table_changes_actions(spark, d, starting_version=0,
                                        max_files=2, page_token=token)
            pages += self._files(out)
            token = out["nextPageToken"]
        versions = {ln[k]["version"] for ln in pages
                    for k in ("add", "cdf", "remove") if k in ln}
        assert max(versions) == 4  # the mid-pagination commit (v5) absent
        assert len(pages) == 5  # create + 4 appends, one file each

    def test_paged_over_http_with_trailer(self, spark, deep_cdf,
                                          tmp_path):
        from delta_sharing_spark.auth import BearerTokenAuthProvider
        from delta_sharing_spark.catalog import ShareCatalog
        from delta_sharing_spark.rest import DataSharingRestClient
        from delta_sharing_spark.server import SharingServer

        d, _log = deep_cdf
        cat = ShareCatalog(spark)
        cat.add_table("s", "d", "t", d, cdf_enabled=True)
        srv = SharingServer(cat, bearer_token="tok")
        url = srv.serve_background()
        try:
            c = DataSharingRestClient(
                url, auth_provider=BearerTokenAuthProvider("tok"))
            lines = c.list_table_changes("s", "d", "t",
                                         starting_version=0, max_files=3)
            trailer = [ln for ln in lines if "endStreamAction" in ln]
            assert trailer and trailer[0]["endStreamAction"][
                "nextPageToken"]
            n_page1 = sum(1 for ln in lines if "add" in ln)
            assert n_page1 == 3
            token = trailer[0]["endStreamAction"]["nextPageToken"]
            rest = c.list_table_changes("s", "d", "t", starting_version=0,
                                        max_files=10, page_token=token)
            n_page2 = sum(1 for ln in rest if "add" in ln)
            assert n_page1 + n_page2 == 5
        finally:
            srv.shutdown()
