"""REST façade integration: boot the server, hit every endpoint over HTTP,
parse the NDJSON action streams (DeltaSharingServiceSuite intent)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from delta_sharing_spark.catalog import ShareCatalog
from delta_sharing_spark.plans.log import TableLog
from delta_sharing_spark.server import SharingServer


@pytest.fixture(scope="module")
def server(spark, events, tmp_path_factory):
    base = tmp_path_factory.mktemp("srv")
    d = str(base / "events")
    log = TableLog(spark, d)
    log.create(events, partition_by=["event_type"], name="events",
               configuration={"enableChangeDataFeed": "true"})
    log.delete("event_id < 5")
    cat = ShareCatalog(spark)
    cat.add_table("share1", "default", "events", d, cdf_enabled=True)
    srv = SharingServer(cat, bearer_token="secret-token")
    url = srv.serve_background()
    yield url
    srv.shutdown()


def _get(url: str, token: str | None = "secret-token"):
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req) as resp:
        return resp.status, dict(resp.headers), resp.read().decode()


def _post(url: str, body: dict, token: str | None = "secret-token"):
    req = urllib.request.Request(url, data=json.dumps(body).encode(),
                                 method="POST")
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req) as resp:
        return resp.status, dict(resp.headers), resp.read().decode()


def _ndjson(text: str) -> list[dict]:
    return [json.loads(line) for line in text.splitlines() if line]


class TestEndpoints:
    def test_auth_required(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{server}/shares", token=None)
        assert e.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{server}/shares", token="wrong")
        assert e.value.code == 401

    def test_listings(self, server):
        _s, _h, body = _get(f"{server}/shares")
        assert json.loads(body)["items"] == [{"name": "share1"}]
        _s, _h, body = _get(f"{server}/shares/share1/schemas")
        assert json.loads(body)["items"][0]["name"] == "default"
        _s, _h, body = _get(
            f"{server}/shares/share1/schemas/default/tables")
        assert json.loads(body)["items"][0]["name"] == "events"
        _s, _h, body = _get(f"{server}/shares/share1/all-tables")
        assert len(json.loads(body)["items"]) == 1

    def test_version_header(self, server):
        _s, headers, _b = _get(
            f"{server}/shares/share1/schemas/default/tables/events/version")
        assert headers["Delta-Table-Version"] == "1"

    def test_metadata_ndjson(self, server):
        _s, headers, body = _get(
            f"{server}/shares/share1/schemas/default/tables/events/metadata")
        lines = _ndjson(body)
        assert "protocol" in lines[0]
        meta = lines[1]["metaData"]
        assert meta["partitionColumns"] == ["event_type"]
        assert "schemaString" in meta

    def test_query_with_predicates_and_paging(self, server):
        url = f"{server}/shares/share1/schemas/default/tables/events/query"
        _s, _h, body = _post(url, {})
        all_files = [line for line in _ndjson(body) if "file" in line]
        hints = {"op": "equal", "children": [
            {"op": "column", "name": "event_type", "valueType": "string"},
            {"op": "literal", "value": "click", "valueType": "string"}]}
        _s, _h, body = _post(url, {"jsonPredicateHints": hints})
        pruned = [line for line in _ndjson(body) if "file" in line]
        assert 0 < len(pruned) < len(all_files)
        # paging
        _s, _h, body = _post(url, {"maxFiles": 2})
        lines = _ndjson(body)
        files = [line for line in lines if "file" in line]
        assert len(files) == 2
        end = [line for line in lines if "endStreamAction" in line]
        token = end[0]["endStreamAction"]["nextPageToken"]
        _s, _h, body = _post(url, {"maxFiles": 100, "pageToken": token})
        rest = [line for line in _ndjson(body) if "file" in line]
        assert len(files) + len(rest) == len(all_files)

    def test_changes_ndjson(self, server):
        url = (f"{server}/shares/share1/schemas/default/tables/events/"
               f"changes?startingVersion=1")
        _s, _h, body = _get(url)
        lines = _ndjson(body)
        cdfs = [line["cdf"] for line in lines if "cdf" in line]
        assert cdfs and all(c["version"] == 1 for c in cdfs)

    def test_errors(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{server}/shares/nope")
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{server}/shares/share1/schemas/default/tables/events/query",
                  {"version": 99})
        assert e.value.code == 400
