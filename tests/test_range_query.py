"""Version-range QueryTable (startingVersion/endingVersion) + remote
streaming over the REST profile.

Reference surfaces: PROTOCOL.md:2147-2152 (query body), the data-change
emission of queryDataChangeSinceStartVersion
(server/src/main/scala/io/delta/standalone/internal/DeltaSharedTable.scala:
557-695), service validation (DeltaSharingService.scala:463-498,533-561,
exercised by DeltaSharingServiceSuite.scala:1063,2214), and the remote
streaming client (client/.../spark/DeltaSharingSource.scala:93-1208 with
maxVersionsPerRpc windowing, DeltaSharingOptions.scala:199)."""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

from delta_sharing_spark.plans.log import TableLog
from delta_sharing_spark.table import SharedTable, UnsupportedTableFeatureError


def _mk_table(spark, d):
    """v0: ids [0,4) — v1: append [4,7) — v2: append [7,10)."""
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    log = TableLog(spark, d)
    log.create(df.filter("id < 4").coalesce(1), name="t")
    log.append(df.filter("id >= 4 and id < 7").coalesce(1))
    log.append(df.filter("id >= 7").coalesce(1))
    return log


def _files(out, kinds=("add", "remove")):
    return [(k, line[k]) for line in out["actions"]
            for k in kinds if k in line]


class TestRangeQueryActions:
    @pytest.fixture(scope="class")
    def table(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("range") / "t")
        _mk_table(spark, d)
        return SharedTable(spark, d)

    def test_adds_carry_version_and_timestamp(self, table):
        out = table.query_actions(starting_version=1)
        assert out["version"] == 1  # snapshot head at startingVersion
        files = _files(out)
        assert [k for k, _ in files] == ["add", "add"]
        assert [a["version"] for _, a in files] == [1, 2]
        assert all(a["timestamp"] > 0 for _, a in files)
        # head metaData is stamped with startingVersion
        meta = next(line["metaData"] for line in out["actions"]
                    if "metaData" in line)
        assert meta["version"] == 1

    def test_ending_version_bounds_inclusive(self, table):
        out = table.query_actions(starting_version=0, ending_version=1)
        assert {a["version"] for _, a in _files(out)} == {0, 1}

    def test_removes_included_as_data_change(self, spark, tmp_path):
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        log.delete("id >= 7")  # v3: rewrites/removes the [7,10) file
        out = SharedTable(spark, d).query_actions(starting_version=3)
        kinds = {k for k, _ in _files(out)}
        assert "remove" in kinds
        assert all(a["version"] == 3 for _, a in _files(out))

    def test_historical_metadata_interleaved(self, spark, tmp_path):
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        log.add_column("w", "double")  # v3: metadata commit
        log.append(spark.range(10, 12).selectExpr(
            "id", "id * 2 as v", "cast(id as double) as w").coalesce(1))
        out = SharedTable(spark, d).query_actions(starting_version=1)
        metas = [line["metaData"] for line in out["actions"]
                 if "metaData" in line]
        # head (v=1) + historical (v=3)
        assert [m["version"] for m in metas] == [1, 3]
        assert "w" in metas[1]["schemaString"]

    def test_pagination_walks_all_files(self, table):
        pages, token, seen = 0, None, []
        while True:
            out = table.query_actions(starting_version=0, max_files=1,
                                      page_token=token)
            seen += [a["id"] for _, a in _files(out)]
            pages += 1
            end = next(line["endStreamAction"] for line in out["actions"]
                       if "endStreamAction" in line)
            token = end.get("nextPageToken")
            if not token:
                break
        full = [a["id"] for _, a in
                _files(table.query_actions(starting_version=0))]
        assert seen == full and pages == len(full)

    def test_trailing_metadata_after_exactly_full_page(self, spark,
                                                       tmp_path):
        """Range-form twin of the changes-RPC advice finding: when the
        final page is exactly full and the range ends in metadata-only
        commits, a continuation token must still be minted so the
        trailing historical metaData lines reach the client."""
        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(2).selectExpr("id AS k").coalesce(1),
                   name="t")
        log.append(spark.range(2, 4).selectExpr("id AS k").coalesce(1))
        log.enable_column_mapping()  # v2: trailing metadata-only commit
        t = SharedTable(spark, d)

        def metas(out):
            return [ln["metaData"].get("version") for ln in out["actions"]
                    if "metaData" in ln][1:]  # drop the head line

        full = t.query_actions(starting_version=0,
                               response_formats={"delta"})
        pages, files, token = [], 0, None
        for _ in range(10):
            out = t.query_actions(starting_version=0, max_files=2,
                                  page_token=token,
                                  response_formats={"delta"})
            pages += metas(out)
            files += len(_files(out))
            token = out["nextPageToken"]
            if token is None:
                break
        assert token is None
        assert files == 2
        assert pages == metas(full), \
            f"paged historical metaData {pages} != unpaged {metas(full)}"

    def test_page_token_checksum_binds_params(self, table):
        out = table.query_actions(starting_version=0, max_files=1)
        tok = out["nextPageToken"]
        with pytest.raises(ValueError, match="different query parameters"):
            table.query_actions(starting_version=1, max_files=1,
                                page_token=tok)

    def test_validation_error_parity(self, table):
        with pytest.raises(ValueError,
                           match=r"Please only provide one of"):
            table.query_actions(version=1, starting_version=1)
        with pytest.raises(ValueError,
                           match="startingVersion cannot be negative"):
            table.query_actions(starting_version=-1)
        with pytest.raises(
                ValueError,
                match=r"startingVersion\(2\) must be smaller than or "
                      r"equal to endingVersion\(1\)"):
            table.query_actions(starting_version=2, ending_version=1)
        with pytest.raises(Exception,
                           match="Start version cannot be greater"):
            table.query_actions(starting_version=99)
        with pytest.raises(Exception,
                           match="End version cannot be greater"):
            table.query_actions(starting_version=0, ending_version=99)


class TestHistoricalProtocol:
    def test_protocol_inlined_on_column_mapping_enable(self, spark,
                                                       tmp_path):
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        log.enable_column_mapping()  # v3: reader-feature change
        log.append(spark.range(10, 12).selectExpr(
            "id", "id * 2 as v").coalesce(1))
        out = SharedTable(spark, d).query_actions(
            starting_version=1, response_formats={"delta"},
            include_historical_protocol=True)
        protos = [line["protocol"] for line in out["actions"]
                  if "protocol" in line]
        assert protos[0].get("version") == 1  # stamped head
        hist = [p for p in protos[1:]]
        assert hist and hist[0]["version"] == 3
        assert hist[0]["minReaderVersion"] == 2

    def test_protocol_inlined_on_changes_rpc(self, spark, tmp_path):
        """The CDF form supports includeHistoricalProtocol like the range
        form (ref queryCDF's includeHistoricalProtocol,
        DeltaSharedTable.scala:705,748-757): historical protocol actions
        interleave per commit, the head protocol is version-stamped under
        the opt-in, and the legacy wire shape is untouched without it."""
        from delta_sharing_spark.cdf import table_changes_actions

        d = str(tmp_path / "t")
        df = spark.range(10).selectExpr("id", "id * 2 as v")
        log = TableLog(spark, d)
        log.create(df.filter("id < 4").coalesce(1), name="t",
                   configuration={"delta.enableChangeDataFeed": "true"})
        log.append(df.filter("id >= 4 and id < 7").coalesce(1))
        log.enable_column_mapping()  # v2: reader-feature change
        log.append(df.filter("id >= 7").coalesce(1))
        out = table_changes_actions(spark, d, starting_version=1,
                                    include_historical_protocol=True)
        protos = [ln["protocol"] for ln in out["actions"]
                  if "protocol" in ln]
        assert protos[0].get("version") == 3  # stamped head (range end)
        hist = protos[1:]
        assert hist and hist[0]["version"] == 2
        assert hist[0]["minReaderVersion"] == 2
        # legacy shape without the opt-in
        out = table_changes_actions(spark, d, starting_version=1)
        protos = [ln["protocol"] for ln in out["actions"]
                  if "protocol" in ln]
        assert len(protos) == 1 and "version" not in protos[0]

    def test_parquet_profile_refused_across_cm_enable(self, spark,
                                                      tmp_path):
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        log.enable_column_mapping()
        with pytest.raises(UnsupportedTableFeatureError,
                           match="parquet response format"):
            SharedTable(spark, d).query_actions(starting_version=1)

    def test_no_protocol_lines_without_opt_in(self, spark, tmp_path):
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        log.enable_column_mapping()
        out = SharedTable(spark, d).query_actions(
            starting_version=1, response_formats={"delta"})
        protos = [line["protocol"] for line in out["actions"]
                  if "protocol" in line]
        assert len(protos) == 1 and "version" not in protos[0]


def _serve(spark, d, cdf=False):
    import tempfile

    from delta_sharing_spark.catalog import ShareCatalog
    from delta_sharing_spark.server import SharingServer

    cat = ShareCatalog(spark)
    cat.add_table("s", "d", "t", d, cdf_enabled=cdf)
    srv = SharingServer(cat, bearer_token="tok")
    url = srv.serve_background()
    prof = tempfile.NamedTemporaryFile(mode="w", suffix=".json",
                                       delete=False)
    json.dump({"shareCredentialsVersion": 1, "endpoint": url,
               "bearerToken": "tok"}, prof)
    prof.close()
    return srv, prof.name


class TestRangeQueryHttp:
    def test_range_over_live_server(self, spark, tmp_path):
        from delta_sharing_spark.auth import BearerTokenAuthProvider
        from delta_sharing_spark.rest import DataSharingRestClient

        d = str(tmp_path / "t")
        _mk_table(spark, d)
        srv, prof = _serve(spark, d)
        try:
            client = DataSharingRestClient(
                f"http://127.0.0.1:{srv.port}",
                auth_provider=BearerTokenAuthProvider("tok"))
            _h, lines = client.list_files_in_table(
                "s", "d", "t", starting_version=1)
            adds = [line["add"] for line in lines if "add" in line]
            assert [a["version"] for a in adds] == [1, 2]
            # service validation parity (DeltaSharingServiceSuite.scala:2214)
            from delta_sharing_spark.rest import HttpStatusError

            for body, frag in [
                (dict(starting_version=-1), "cannot be negative"),
                (dict(version=1, starting_version=1),
                 "Please only provide one of"),
                (dict(starting_version=0, max_files=0),
                 "maxFiles must be positive"),
            ]:
                with pytest.raises(HttpStatusError) as ei:
                    client.list_files_in_table("s", "d", "t", **body)
                assert ei.value.status_code == 400
                assert frag in str(ei.value)
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_include_refresh_token_rejected_with_range(self, spark,
                                                       tmp_path):
        import urllib.request

        d = str(tmp_path / "t")
        _mk_table(spark, d)
        srv, prof = _serve(spark, d)
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/shares/s/schemas/d/tables/t"
                "/query",
                data=json.dumps({"startingVersion": 0,
                                 "includeRefreshToken": True}).encode(),
                method="POST",
                headers={"Authorization": "Bearer tok",
                         "Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
            assert "includeRefreshToken cannot be used" in \
                ei.value.read().decode()
        finally:
            srv.shutdown()
            os.unlink(prof)


class TestEndStreamActionCapability:
    def test_trailer_on_every_response_when_requested(self, spark,
                                                      tmp_path):
        """delta-sharing-capabilities: includeendstreamaction=true adds an
        endStreamAction trailer to query / range / changes responses even
        without pagination (ref getRequestEndStreamAction)."""
        import urllib.request

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(4).selectExpr("id").coalesce(1), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.append(spark.range(4, 6).selectExpr("id").coalesce(1))
        srv, prof = _serve(spark, d, cdf=True)
        base = (f"http://127.0.0.1:{srv.port}/shares/s/schemas/d/tables/t")
        hdrs = {"Authorization": "Bearer tok",
                "Content-Type": "application/json",
                "delta-sharing-capabilities": "includeendstreamaction=true"}
        try:
            def lines_of(url, body=None):
                req = urllib.request.Request(
                    url, data=json.dumps(body).encode() if body else None,
                    method="POST" if body is not None else "GET",
                    headers=hdrs)
                with urllib.request.urlopen(req) as r:
                    return [json.loads(x) for x in
                            r.read().decode().splitlines() if x]

            for lines in (
                lines_of(f"{base}/query", body={}),
                lines_of(f"{base}/query", body={"startingVersion": 0}),
                lines_of(f"{base}/changes?startingVersion=0"),
            ):
                assert "endStreamAction" in lines[-1], lines[-1]
            # without the capability: no trailer on unpaged responses
            del hdrs["delta-sharing-capabilities"]
            for lines in (
                lines_of(f"{base}/query", body={}),
                lines_of(f"{base}/changes?startingVersion=0"),
            ):
                assert "endStreamAction" not in lines[-1]
        finally:
            srv.shutdown()
            os.unlink(prof)


class TestMetadataVersionParams:
    def test_metadata_rpc_time_travel(self, spark, tmp_path):
        from delta_sharing_spark.auth import BearerTokenAuthProvider
        from delta_sharing_spark.rest import DataSharingRestClient

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(3).selectExpr("id").coalesce(1), name="t")
        log.add_column("w", "double")
        srv, prof = _serve(spark, d)
        try:
            client = DataSharingRestClient(
                f"http://127.0.0.1:{srv.port}",
                auth_provider=BearerTokenAuthProvider("tok"))
            v0 = client.query_table_metadata("s", "d", "t", version=0)
            latest = client.query_table_metadata("s", "d", "t")
            v0_schema = next(m["metaData"]["schemaString"]
                             for m in v0 if "metaData" in m)
            latest_schema = next(m["metaData"]["schemaString"]
                                 for m in latest if "metaData" in m)
            assert "w" not in v0_schema and "w" in latest_schema
        finally:
            srv.shutdown()
            os.unlink(prof)


class TestRemoteStreaming:
    """The reference's remote streaming consumer: readStream against an
    http profile, micro-batches planned through version-range QueryTable
    RPCs (DeltaSharingSource.scala:277-322)."""

    def _drain(self, spark, path, **options):
        from delta_sharing_spark.sources.datasource import (
            SharedTableDataSource,
        )

        spark.dataSource.register(SharedTableDataSource)
        name = f"remote_{uuid.uuid4().hex[:8]}"
        reader = spark.readStream.format("deltashare").option("path", path)
        for k, v in options.items():
            reader = reader.option(k, v)
        q = (reader.load().writeStream.format("memory").queryName(name)
             .trigger(processingTime="200 milliseconds").start())
        q.processAllAvailable()
        q.stop()
        return spark.table(name)

    def test_snapshot_then_incremental_over_http(self, spark, tmp_path):
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        srv, prof = _serve(spark, d)
        try:
            url = f"{prof}#s.d.t"
            got = self._drain(spark, url, maxFilesPerTrigger="1",
                              maxVersionsPerRpc="1")
            assert sorted(r["id"] for r in got.collect()) == list(range(10))
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_starting_version_and_checkpoint_restart(self, spark,
                                                     tmp_path):
        from delta_sharing_spark.sources.datasource import (
            SharedTableDataSource,
        )

        d = str(tmp_path / "t")
        log = _mk_table(spark, d)
        srv, prof = _serve(spark, d)
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")
        try:
            url = f"{prof}#s.d.t"
            spark.dataSource.register(SharedTableDataSource)

            def run():
                q = (spark.readStream.format("deltashare")
                     .option("path", url)
                     .option("startingVersion", "1")
                     .option("maxFilesPerTrigger", "1")
                     .load()
                     .writeStream.format("parquet")
                     .option("path", out_dir)
                     .option("checkpointLocation", ckpt)
                     .trigger(processingTime="200 milliseconds")
                     .start())
                q.processAllAvailable()
                q.stop()

            run()
            first = {r["id"] for r in spark.read.parquet(out_dir).collect()}
            assert first == set(range(4, 10))  # v1+v2 appends only
            log.append(spark.range(12, 14).selectExpr(
                "id", "id * 2 as v").coalesce(1))
            run()  # restart from checkpoint: only the new commit, no dupes
            rows = spark.read.parquet(out_dir).collect()
            ids = sorted(r["id"] for r in rows)
            assert ids == [4, 5, 6, 7, 8, 9, 12, 13]  # exactly-once
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_local_profile_resolves_to_table_dir(self, spark, tmp_path):
        """A non-http profile (catalog-config endpoint) streams through
        the local log — no HTTP hop for same-process tables."""
        d = str(tmp_path / "t")
        _mk_table(spark, d)
        cfg = {"shares": [{"name": "s", "schemas": [
            {"name": "d", "tables": [{"name": "t", "location": d}]}]}]}
        cfg_path = str(tmp_path / "catalog.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        prof_path = str(tmp_path / "prof.json")
        with open(prof_path, "w") as f:
            json.dump({"shareCredentialsVersion": 1,
                       "endpoint": cfg_path, "bearerToken": ""}, f)
        got = self._drain(spark, f"{prof_path}#s.d.t")
        assert got.count() == 10

    def test_remote_schema_tracking_evolves_on_restart(self, spark,
                                                       tmp_path):
        """schemaTrackingLocation over an http profile: the seed comes
        from the versioned metadata RPC, the boundary protocol (drain,
        persist, retryable failure, restart under the evolved schema)
        runs through the range-RPC-backed RemoteTableLog unchanged."""
        from pyspark.sql.streaming import StreamingQueryException

        from delta_sharing_spark.sources.datasource import (
            SharedTableDataSource,
        )

        d = str(tmp_path / "t")
        # v must be NULLABLE: the parquet sink marks non-null columns
        # REQUIRED, and a required column can't null-fill when reading the
        # post-drop sink files alongside the pre-drop ones
        df = spark.range(10).selectExpr(
            "id", "if(id >= 0, id * 2, NULL) as v")
        log = TableLog(spark, d)
        log.create(df.filter("id < 4").coalesce(1), name="t")
        log.enable_column_mapping()
        log.append(df.filter("id >= 4 and id < 7").coalesce(1))
        log.drop_column("v")
        log.append(df.filter("id >= 7").selectExpr("id").coalesce(1))
        srv, prof = _serve(spark, d)
        ckpt, out_dir = str(tmp_path / "ckpt"), str(tmp_path / "out")
        track = str(tmp_path / "track")
        try:
            url = f"{prof}#s.d.t"
            spark.dataSource.register(SharedTableDataSource)

            def run():
                q = (spark.readStream.format("deltashare")
                     .option("path", url)
                     .option("startingVersion", "0")
                     .option("maxFilesPerTrigger", "1")
                     .option("schemaTrackingLocation", track)
                     .load()
                     .writeStream.format("parquet")
                     .option("path", out_dir)
                     .option("checkpointLocation", ckpt)
                     .trigger(processingTime="200 milliseconds")
                     .queryName(f"rst_{uuid.uuid4().hex[:6]}")
                     .start())
                try:
                    q.processAllAvailable()
                finally:
                    q.stop()

            with pytest.raises(StreamingQueryException):
                run()  # drains ids [0,7) with v, then evolves at the drop
            pre = spark.read.parquet(out_dir)
            assert pre.count() == 7
            assert pre.filter("v IS NOT NULL").count() == 7
            from delta_sharing_spark.streaming.schema import (
                SchemaTrackingLog,
            )

            entry = SchemaTrackingLog(track).latest()
            assert entry is not None and '"v"' not in entry["schemaString"]
            run()
            final = spark.read.option("mergeSchema", "true").parquet(out_dir)
            assert sorted(r["id"] for r in final.collect()) == list(range(10))
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_remote_cdf_streaming(self, spark, tmp_path):
        d = str(tmp_path / "t")
        df = spark.range(6).selectExpr("id", "id * 2 as v")
        log = TableLog(spark, d)
        log.create(df.coalesce(1), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.delete("id < 2")
        srv, prof = _serve(spark, d, cdf=True)
        try:
            got = self._drain(spark, f"{prof}#s.d.t",
                              readChangeFeed="true", startingVersion="1")
            by_type = {r["_change_type"] for r in got.collect()}
            assert "delete" in by_type
            assert all(r["_commit_version"] == 1 for r in got.collect())
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_remote_cdf_paged_backlog(self, spark, tmp_path):
        """maxFilesPerRpc pages every CDF window fetch (maxFiles +
        nextPageToken following inside one fetch), so a commit larger
        than a server page cap still drains completely — result and
        offsets identical to the unpaged drain."""
        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        # v0: 4 files (> the 1-file page), v1: delete -> cdc, v2: append
        log.create(spark.range(8).selectExpr("id", "id * 2 as v")
                   .repartition(4), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.delete("id < 2")
        log.append(spark.range(8, 10).selectExpr("id", "id * 2 as v")
                   .coalesce(1))
        srv, prof = _serve(spark, d, cdf=True)
        try:
            url = f"{prof}#s.d.t"
            paged = self._drain(spark, url, readChangeFeed="true",
                                startingVersion="0", maxFilesPerRpc="1",
                                maxVersionsPerRpc="1")
            plain = self._drain(spark, url, readChangeFeed="true",
                                startingVersion="0")
            key = ["id", "_change_type", "_commit_version"]
            assert sorted(tuple(r[k] for k in key)
                          for r in paged.collect()) == \
                sorted(tuple(r[k] for k in key) for r in plain.collect())
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_paged_window_retry_does_not_duplicate_actions(self, spark,
                                                           tmp_path):
        """A mid-pagination RPC failure must not leave a partially
        ingested window behind: pages buffer until the token loop drains,
        so the retry re-fetches from page 1 into a clean slate instead of
        appending page 1's add actions twice (round-9 review finding —
        duplicated rows on stream retry)."""
        from delta_sharing_spark.sources.remote import RemoteTableLog

        d = str(tmp_path / "t")
        log = _mk_table(spark, d)  # 3 versions, multiple files
        srv, prof = _serve(spark, d)
        try:
            rlog = RemoteTableLog(prof, "s", "d", "t",
                                  max_files_per_rpc=1)
            real = rlog._client.list_files_in_table
            calls = {"n": 0}

            def flaky(*a, **kw):
                calls["n"] += 1
                if calls["n"] == 2:  # fail the second PAGE of window 1
                    raise ConnectionError("injected mid-pagination failure")
                return real(*a, **kw)

            rlog._client.list_files_in_table = flaky
            with pytest.raises(ConnectionError):
                rlog.commits(0, None)
            # page 1 of the failed window must NOT have been ingested
            assert all(not c.adds for c in rlog._commits.values())
            rlog._client.list_files_in_table = real
            cs = {c.version: c for c in rlog.commits(0, None)}
            clean = RemoteTableLog(prof, "s", "d", "t")
            want = {c.version: c for c in clean.commits(0, None)}
            assert set(cs) == set(want)
            for v in want:
                got_paths = sorted(a.path for a in cs[v].adds)
                want_paths = sorted(a.path for a in want[v].adds)
                assert got_paths == want_paths, \
                    f"v{v}: retry duplicated or dropped actions"
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_remote_range_paged_backlog(self, spark, tmp_path):
        """Non-CDF twin: the snapshot-start + incremental range fetches
        follow pagination too."""
        d = str(tmp_path / "t")
        log = _mk_table(spark, d)  # 3 versions, multiple files
        srv, prof = _serve(spark, d)
        try:
            got = self._drain(spark, f"{prof}#s.d.t",
                              startingVersion="0", maxFilesPerRpc="1")
            assert sorted(r["id"] for r in got.collect()) == list(range(10))
        finally:
            srv.shutdown()
            os.unlink(prof)


class TestRemoteBatch:
    def test_batch_read_over_http_with_pushdown(self, spark, tmp_path):
        from delta_sharing_spark.sources.datasource import (
            SharedTableDataSource,
        )

        d = str(tmp_path / "t")
        ev = spark.range(20).selectExpr(
            "id", "case when id % 2 = 0 then 'a' else 'b' end as g")
        log = TableLog(spark, d)
        log.create(ev, partition_by=["g"], name="t")
        srv, prof = _serve(spark, d)
        try:
            spark.dataSource.register(SharedTableDataSource)
            got = (spark.read.format("deltashare")
                   .option("path", f"{prof}#s.d.t").load()
                   .filter(F.col("g") == "a"))
            assert sorted(r["id"] for r in got.collect()) \
                == list(range(0, 20, 2))
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_batch_cdf_over_http(self, spark, tmp_path):
        from delta_sharing_spark.sources.datasource import (
            SharedTableDataSource,
        )

        d = str(tmp_path / "t")
        df = spark.range(6).selectExpr("id", "id * 2 as v")
        log = TableLog(spark, d)
        log.create(df.coalesce(1), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        log.delete("id < 2")
        srv, prof = _serve(spark, d, cdf=True)
        try:
            spark.dataSource.register(SharedTableDataSource)
            got = (spark.read.format("deltashare")
                   .option("path", f"{prof}#s.d.t")
                   .option("readChangeFeed", "true")
                   .option("startingVersion", "1").load())
            assert {r["_change_type"] for r in got.collect()} >= {"delete"}
        finally:
            srv.shutdown()
            os.unlink(prof)

    def test_batch_cdf_rejects_latest(self, spark, tmp_path):
        from delta_sharing_spark.cdf import CDFError
        from delta_sharing_spark.sources.datasource import (
            SharedTableCDFBatchReader,
        )
        from pyspark.sql import types as T

        d = str(tmp_path / "t")
        log = TableLog(spark, d)
        log.create(spark.range(3).coalesce(1), name="t",
                   configuration={"enableChangeDataFeed": "true"})
        reader = SharedTableCDFBatchReader(
            {"path": d, "startingversion": "latest"},
            T.StructType([T.StructField("id", T.LongType())]))
        with pytest.raises(CDFError, match="streaming"):
            reader.partitions()
