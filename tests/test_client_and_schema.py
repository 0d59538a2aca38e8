"""Client surface (profiles, load_as_*), schema compatibility gate, refresh
tokens, byte-based admission."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_sharing_spark.client import (
    DeltaSharingProfile,
    SharingClient,
    load_as_pandas,
    load_as_spark,
    load_table_changes_as_spark,
)
from delta_sharing_spark.plans.log import TableLog
from delta_sharing_spark.streaming.schema import (
    SchemaCompatError,
    check_read_compatible,
    is_read_compatible,
)
from delta_sharing_spark.table import SharedTable


@pytest.fixture()
def profile_env(spark, events, tmp_path):
    table_dir = str(tmp_path / "events_table")
    log = TableLog(spark, table_dir)
    log.create(events, name="events",
               configuration={"enableChangeDataFeed": "true"})
    log.delete("event_id < 5")
    config = {
        "shares": [{
            "name": "share1",
            "schemas": [{
                "name": "default",
                "tables": [{"name": "events", "location": table_dir,
                            "cdfEnabled": True}],
            }],
        }]
    }
    config_path = str(tmp_path / "catalog.json")
    with open(config_path, "w") as f:
        json.dump(config, f)
    profile_path = str(tmp_path / "profile.json")
    with open(profile_path, "w") as f:
        json.dump({"shareCredentialsVersion": 1, "endpoint": config_path}, f)
    return profile_path


class TestClient:
    def test_profile_parse(self, profile_env):
        p = DeltaSharingProfile.read_from_file(profile_env)
        assert p.share_credentials_version == 1

    def test_unsupported_profile_version(self, tmp_path):
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as f:
            json.dump({"shareCredentialsVersion": 99, "endpoint": "x"}, f)
        with pytest.raises(ValueError, match="too new"):
            DeltaSharingProfile.read_from_file(bad)

    def test_profile_v2_oauth_parse(self, tmp_path):
        p = DeltaSharingProfile.from_json({
            "shareCredentialsVersion": 2,
            "type": "oauth_client_credentials",
            "endpoint": "https://sharing.example.com/",
            "tokenEndpoint": "https://idp.example.com/token/",
            "clientId": "cid", "clientSecret": "sec", "scope": "read",
        })
        assert p.share_credentials_version == 2
        assert p.type == "oauth_client_credentials"
        assert p.endpoint == "https://sharing.example.com"  # slash stripped
        assert p.token_endpoint == "https://idp.example.com/token"
        assert (p.client_id, p.client_secret, p.scope) == \
            ("cid", "sec", "read")

    def test_profile_v2_bearer_and_unknown_type(self):
        p = DeltaSharingProfile.from_json({
            "shareCredentialsVersion": 2, "type": "bearer_token",
            "endpoint": "e", "bearerToken": "t",
            "expirationTime": "2030-01-01T00:00:00Z"})
        assert p.bearer_token == "t"
        with pytest.raises(ValueError, match="does not supports"):
            DeltaSharingProfile.from_json({
                "shareCredentialsVersion": 2, "type": "oauth_magic",
                "endpoint": "e"})

    def test_expired_bearer_profile_rejected(self, spark, profile_env,
                                             tmp_path):
        with open(profile_env) as f:
            cfg = json.load(f)
        cfg["bearerToken"] = "tok"
        cfg["expirationTime"] = "2020-01-01T00:00:00Z"
        expired = str(tmp_path / "expired.json")
        with open(expired, "w") as f:
            json.dump(cfg, f)
        from delta_sharing_spark.client import load_as_spark
        with pytest.raises(ValueError, match="expired at 2020-01-01"):
            load_as_spark(f"{expired}#share1.default.events", spark=spark)
        # unexpired profile loads fine
        cfg["expirationTime"] = "2099-01-01T00:00:00Z"
        ok = str(tmp_path / "ok.json")
        with open(ok, "w") as f:
            json.dump(cfg, f)
        assert load_as_spark(f"{ok}#share1.default.events",
                             spark=spark).count() > 0

    def test_provider_factory_dispatch(self):
        from delta_sharing_spark.auth import (
            BearerTokenAuthProvider, OAuthClientCredentialsAuthProvider,
            create_credential_provider)

        bearer = create_credential_provider(DeltaSharingProfile.from_json({
            "shareCredentialsVersion": 1, "endpoint": "e",
            "bearerToken": "t"}))
        assert isinstance(bearer, BearerTokenAuthProvider)
        headers: dict = {}
        bearer.add_auth_header(headers)
        assert headers["Authorization"] == "Bearer t"
        oauth = create_credential_provider(DeltaSharingProfile.from_json({
            "shareCredentialsVersion": 2,
            "type": "oauth_client_credentials", "endpoint": "e",
            "tokenEndpoint": "http://127.0.0.1:1/token",
            "clientId": "c", "clientSecret": "s"}))
        assert isinstance(oauth, OAuthClientCredentialsAuthProvider)

    def test_load_as_spark(self, spark, events, profile_env):
        url = f"{profile_env}#share1.default.events"
        df = load_as_spark(url, spark=spark)
        assert df.count() == events.count() - 5
        v0 = load_as_spark(url, version=0, spark=spark)
        assert v0.count() == events.count()

    def test_load_as_pandas_limit(self, spark, profile_env):
        url = f"{profile_env}#share1.default.events"
        pdf = load_as_pandas(url, limit=7, spark=spark)
        assert len(pdf) == 7

    def test_load_table_changes(self, spark, profile_env):
        url = f"{profile_env}#share1.default.events"
        ch = load_table_changes_as_spark(url, starting_version=1, spark=spark)
        assert set(r["_change_type"] for r in ch.collect()) == {"delete"}

    def test_load_table_changes_as_pandas_matches_spark(
            self, spark, profile_env):
        from delta_sharing_spark.client import load_table_changes_as_pandas

        url = f"{profile_env}#share1.default.events"
        sdf = load_table_changes_as_spark(
            url, starting_version=0, spark=spark)
        via_spark = sdf.toPandas().sort_values(
            list(sdf.columns)).reset_index(drop=True)
        direct = load_table_changes_as_pandas(
            url, starting_version=0, spark=spark)
        assert list(direct.columns) == list(sdf.columns)
        direct = direct.sort_values(
            list(direct.columns)).reset_index(drop=True)
        # same rows, same dtype-insensitive values
        assert len(direct) == len(via_spark)
        for col in sdf.columns:
            assert list(direct[col].astype(str)) == \
                list(via_spark[col].astype(str)), col

    def test_load_table_changes_as_pandas_empty_range(
            self, spark, events, tmp_path):
        # a range covering only a dataChange=false commit (OPTIMIZE) has no
        # change actions -> empty frame with the full CDF column order
        from delta_sharing_spark.client import load_table_changes_as_pandas

        table_dir = str(tmp_path / "opt_table")
        log = TableLog(spark, table_dir)
        log.create(events, name="events",
                   configuration={"enableChangeDataFeed": "true"})
        log.optimize()
        config_path = str(tmp_path / "cat2.json")
        with open(config_path, "w") as f:
            json.dump({"shares": [{"name": "s", "schemas": [{
                "name": "d", "tables": [{"name": "events",
                                         "location": table_dir}]}]}]}, f)
        profile_path = str(tmp_path / "prof2.json")
        with open(profile_path, "w") as f:
            json.dump({"shareCredentialsVersion": 1,
                       "endpoint": config_path}, f)
        latest = load_table_changes_as_pandas(
            f"{profile_path}#s.d.events", starting_version=1, spark=spark)
        assert len(latest) == 0
        assert latest.columns[-3:].tolist() == [
            "_change_type", "_commit_version", "_commit_timestamp"]

    def test_bad_urls(self, spark, profile_env):
        with pytest.raises(ValueError):
            load_as_spark("no-fragment", spark=spark)
        with pytest.raises(ValueError):
            load_as_spark(f"{profile_env}#only.two", spark=spark)

    def test_sharing_client_listing(self, spark, profile_env):
        client = SharingClient(spark, profile_env)
        shares = client.list_shares()
        assert [s.name for s in shares] == ["share1"]
        schemas = client.list_schemas(shares[0])
        assert [s.name for s in schemas] == ["default"]
        tables = client.list_tables(schemas[0])
        assert [t.name for t in tables] == ["events"]
        assert len(client.list_all_tables("share1")) == 1


class TestSchemaCompat:
    BASE = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
    ])

    def test_identical_ok(self):
        assert is_read_compatible(self.BASE, self.BASE)

    def test_added_column_stops_stream(self):
        # any mid-stream addition (nullable or not) is incompatible: the
        # planned reader would silently drop the new data
        # (SchemaUtils.scala:76-79 via DeltaSharingSource.scala:641)
        for nullable in (True, False):
            new = T.StructType(list(self.BASE.fields)
                               + [T.StructField("c", T.IntegerType(),
                                                nullable)])
            assert not is_read_compatible(self.BASE, new)

    def test_dropped_column_reads_as_null(self):
        # planned columns missing from new data are fine — the reader just
        # sees nulls (SchemaUtils.scala:80-82)
        new = T.StructType([self.BASE.fields[0]])
        assert is_read_compatible(self.BASE, new)

    def test_type_change_fails(self):
        new = T.StructType([
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.StringType(), True),
        ])
        assert not is_read_compatible(self.BASE, new)

    def test_nullability_loosen_fails_tighten_ok(self):
        # planned non-null 'a' observed nullable mid-stream -> reader could
        # see nulls in a non-null slot -> stop (SchemaUtils.scala:86);
        # tightening the other way is read-compatible
        loosened = T.StructType([
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ])
        assert not is_read_compatible(self.BASE, loosened)
        assert is_read_compatible(loosened, self.BASE)

    def test_physical_gate_admits_rename_and_widen(self):
        from delta_sharing_spark.streaming.schema import (
            is_read_compatible_physical)

        pk = "delta.columnMapping.physicalName"
        planned = T.StructType([
            T.StructField("points", T.LongType(), True, {pk: "score"}),
            T.StructField("b", T.StringType(), True, {pk: "b"}),
        ])
        # historical rename commit (same physical, old logical) admitted
        renamed = T.StructType([
            T.StructField("score", T.IntegerType(), True, {pk: "score"}),
            T.StructField("b", T.StringType(), True, {pk: "b"}),
        ])
        assert is_read_compatible_physical(planned, renamed)
        # the strict name-based gate would stop on the same commit
        assert not is_read_compatible(planned, renamed)
        # narrowing (plan int, observed long) still stops
        narrow_plan = T.StructType([
            T.StructField("points", T.IntegerType(), True, {pk: "score"}),
            T.StructField("b", T.StringType(), True, {pk: "b"}),
        ])
        observed_long = T.StructType([
            T.StructField("score", T.LongType(), True, {pk: "score"}),
            T.StructField("b", T.StringType(), True, {pk: "b"}),
        ])
        assert not is_read_compatible_physical(narrow_plan, observed_long)
        # a column the plan cannot represent still stops (data loss)
        added = T.StructType(list(renamed.fields)
                             + [T.StructField("c", T.IntegerType(), True,
                                              {pk: "c"})])
        assert not is_read_compatible_physical(planned, added)
        # nullability loosening into a non-null slot still stops
        nonnull_plan = T.StructType([
            T.StructField("points", T.LongType(), False, {pk: "score"}),
        ])
        nullable_obs = T.StructType([
            T.StructField("score", T.IntegerType(), True, {pk: "score"}),
        ])
        assert not is_read_compatible_physical(nonnull_plan, nullable_obs)

    def test_case_rename_fails(self):
        new = T.StructType([
            T.StructField("A", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
        ])
        assert not is_read_compatible(self.BASE, new)

    def test_nested_array_nullability(self):
        planned = T.StructType([
            T.StructField("v", T.ArrayType(T.LongType(), False), True)])
        loosened = T.StructType([
            T.StructField("v", T.ArrayType(T.LongType(), True), True)])
        assert not is_read_compatible(planned, loosened)
        assert is_read_compatible(loosened, planned)

    def test_check_raises(self):
        added = T.StructType(list(self.BASE.fields)
                             + [T.StructField("c", T.IntegerType(), True)])
        with pytest.raises(SchemaCompatError, match="version 3"):
            check_read_compatible(self.BASE, added, version=3)

    def test_stream_stops_on_incompatible_metadata(self, spark, events,
                                                   tmp_path):
        from delta_sharing_spark.sources.datasource import (
            SharedTableStreamReader,
        )

        d = str(tmp_path / "evolve")
        log = TableLog(spark, d)
        base = events.select("event_id", "user_id")
        log.create(base, name="t")
        evolved = T.StructType([
            T.StructField("event_id", T.LongType(), True),
            T.StructField("user_id", T.StringType(), True),  # type change!
        ])
        log.update_metadata(schema=evolved)
        reader = SharedTableStreamReader(
            {"path": d, "startingversion": "0"}, base.schema)
        with pytest.raises(SchemaCompatError):
            reader._file_sequence(0)


class TestRefreshToken:
    def test_refresh_pins_version(self, spark, events, tmp_path):
        d = str(tmp_path / "rt")
        log = TableLog(spark, d)
        log.create(events.limit(50), name="t")
        t = SharedTable(spark, d)
        out = t.query_actions(include_refresh_token=True)
        token = out["refreshToken"]
        assert token is not None and out["version"] == 0
        log.append(events.filter("event_id >= 990"))
        # refresh re-queries the SAME version despite the new commit
        again = t.query_actions(refresh_token=token)
        assert again["version"] == 0
        fresh = t.query_actions()
        assert fresh["version"] == 1

    def test_explicit_version_no_token(self, spark, events, tmp_path):
        d = str(tmp_path / "rt2")
        TableLog(spark, d).create(events.limit(10), name="t")
        t = SharedTable(spark, d)
        out = t.query_actions(version=0, include_refresh_token=True)
        assert out["refreshToken"] is None


class TestByteAdmission:
    def test_max_bytes_per_trigger(self, spark, events, tmp_path):
        from delta_sharing_spark.sources.datasource import (
            SharedTableStreamReader,
        )

        d = str(tmp_path / "bytes")
        log = TableLog(spark, d)
        log.create(events, partition_by=["event_type"], name="t")
        sizes = [a.size for a in TableLog(spark, d).snapshot().files]
        reader = SharedTableStreamReader(
            {"path": d, "startingversion": "0",
             "maxbytespertrigger": str(min(sizes) + 1)}, None)
        off0 = reader.initialOffset()
        reader._last_planned = off0
        end = reader.latestOffset()
        parts = reader.partitions(off0, end)
        assert len(parts) == 1  # byte budget admits exactly one file
        # and a tiny budget still admits at least one (soft cap)
        reader2 = SharedTableStreamReader(
            {"path": d, "startingversion": "0", "maxbytespertrigger": "1"},
            None)
        reader2._last_planned = reader2.initialOffset()
        end2 = reader2.latestOffset()
        assert len(reader2.partitions(off0, end2)) == 1


class TestProfileTypeParity:
    def test_basic_profile(self):
        from delta_sharing_spark.auth import (
            BasicAuthProvider, create_credential_provider)
        p = DeltaSharingProfile.from_json({
            "shareCredentialsVersion": 2, "type": "basic",
            "endpoint": "e", "username": "u", "password": "pw"})
        prov = create_credential_provider(p)
        assert isinstance(prov, BasicAuthProvider)
        h = {}
        prov.add_auth_header(h)
        import base64
        assert h["Authorization"] == \
            "Basic " + base64.b64encode(b"u:pw").decode()

    def test_jwt_profile_parses_but_provider_raises(self):
        from delta_sharing_spark.auth import create_credential_provider
        p = DeltaSharingProfile.from_json({
            "shareCredentialsVersion": 2,
            "type": "oauth_jwt_bearer_private_key_jwt",
            "endpoint": "e",
            "auth": {"tokenEndpoint": "https://idp/token/",
                     "issuer": "iss", "clientId": "cid",
                     "privateKey": {"privateKeyFile": "/k.pem",
                                    "keyId": "k1", "algorithm": "RS256"},
                     "audience": "aud", "scope": "s"}})
        assert p.token_endpoint == "https://idp/token"
        assert p.client_id == "cid"
        with pytest.raises(NotImplementedError, match="JWT signing"):
            create_credential_provider(p)


class TestWireTypeWidening:
    """A type-widened table over the wire must serve the DECLARED (wide)
    schema in both response formats — footer inference on mixed
    narrow/wide files is file-order dependent, so the client rebuilds
    scan under the explicit metaData schema (narrow files upcast
    natively, exactly like the in-process read)."""

    def _serve(self, spark, d, tmp_path, name):
        import json as _json

        from delta_sharing_spark.catalog import ShareCatalog
        from delta_sharing_spark.server import SharingServer

        cat = ShareCatalog(spark)
        cat.add_table("s", "d", "t", d)
        srv = SharingServer(cat, bearer_token="tok")
        url = srv.serve_background()
        prof = tmp_path / f"{name}.json"
        prof.write_text(_json.dumps({
            "shareCredentialsVersion": 1, "endpoint": url,
            "bearerToken": "tok"}))
        return srv, str(prof)

    def test_parquet_profile_mixed_files_widened(self, spark, tmp_path):
        from pyspark.sql import types as T

        from delta_sharing_spark.client import load_as_spark
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t1")
        log = TableLog(spark, d)
        log.create(spark.range(3).selectExpr("cast(id as int) as k")
                   .coalesce(1), name="t",
                   configuration={"delta.enableTypeWidening": "true"})
        log.widen_column_type("k", "long")
        log.append(spark.sql("select cast(3000000000 as long) as k"))
        srv, prof = self._serve(spark, d, tmp_path, "p1")
        try:
            df = load_as_spark(f"{prof}#s.d.t", spark=spark)
            assert isinstance(df.schema["k"].dataType, T.LongType)
            assert sorted(r.k for r in df.collect()) \
                == [0, 1, 2, 3000000000]
        finally:
            srv.shutdown()

    def test_delta_format_cm_widened_all_narrow(self, spark, tmp_path):
        """Column-mapped (delta-format-forced) + widened with ONLY narrow
        files on disk: the rebuild must still come back as the declared
        wide type, not the footer's narrow one."""
        from pyspark.sql import types as T

        from delta_sharing_spark.client import load_as_spark
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t2")
        log = TableLog(spark, d)
        log.create(spark.range(3).selectExpr("cast(id as int) as k")
                   .coalesce(1), name="t",
                   configuration={"delta.enableTypeWidening": "true"})
        log.enable_column_mapping()
        log.widen_column_type("k", "long")
        srv, prof = self._serve(spark, d, tmp_path, "p2")
        try:
            df = load_as_spark(f"{prof}#s.d.t", spark=spark)
            assert isinstance(df.schema["k"].dataType, T.LongType)
            assert sorted(r.k for r in df.collect()) == [0, 1, 2]
        finally:
            srv.shutdown()

    def test_nested_widened_over_wire(self, spark, tmp_path):
        from delta_sharing_spark.client import load_as_spark
        from delta_sharing_spark.plans.log import TableLog

        d = str(tmp_path / "t3")
        log = TableLog(spark, d)
        log.create(spark.sql(
            "SELECT named_struct('x', CAST(id AS INT)) s, id "
            "FROM range(3)").coalesce(1), name="t",
            configuration={"delta.enableTypeWidening": "true"})
        log.widen_column_type("s.x", "long")
        log.append(spark.sql(
            "SELECT named_struct('x', CAST(9000000000 AS LONG)) s, "
            "CAST(99 AS LONG) id"))
        srv, prof = self._serve(spark, d, tmp_path, "p3")
        try:
            df = load_as_spark(f"{prof}#s.d.t", spark=spark)
            got = sorted(r.s.x for r in df.collect())
            assert got == [0, 1, 2, 9000000000]
        finally:
            srv.shutdown()
