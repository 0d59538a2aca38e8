"""REST façade fuzzing: property-based malformed-input sweep over the
HTTP surface. Every response — garbage paths, truncated/garbage JSON
bodies, non-object bodies, oversized/too-deep predicates at the 1 MB/100
limits, corrupted or wrong-parameter page tokens, nonsense query params,
unsupported methods — must be a PROTOCOL-SHAPED document ({"errorCode",
"message"} on errors, parseable NDJSON on 200), never a dropped
connection or a traceback (DeltaSharingServiceSuite.scala's
malformed-request coverage, re-expressed as one hypothesis sweep)."""

from __future__ import annotations

import http.client
import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_sharing_spark.catalog import ShareCatalog
from delta_sharing_spark.plans.log import TableLog
from delta_sharing_spark.server import SharingServer

TOKEN = "fuzz-token"


@pytest.fixture(scope="module")
def fuzz_server(spark, events, tmp_path_factory):
    base = tmp_path_factory.mktemp("fuzz_srv")
    d = str(base / "events")
    log = TableLog(spark, d)
    log.create(events.limit(200), name="events",
               configuration={"enableChangeDataFeed": "true"})
    log.append(events.limit(250).filter("event_id >= 200"))
    cat = ShareCatalog(spark)
    cat.add_table("s", "d", "t", d, cdf_enabled=True)
    srv = SharingServer(cat, bearer_token=TOKEN)
    srv.serve_background()
    yield srv
    srv.shutdown()


def _raw(srv, method: str, path: str, body: bytes | None = None,
         headers: dict | None = None,
         auth: bool = True) -> tuple[int, str]:
    """One raw HTTP exchange with full control over bytes; returns
    (status, body_text). A dropped connection / unparseable response —
    the signature of an unhandled server traceback — fails the test."""
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    try:
        h = dict(headers or {})
        if auth:
            h.setdefault("Authorization", f"Bearer {TOKEN}")
        try:
            conn.request(method, path, body=body, headers=h)
            resp = conn.getresponse()
            return resp.status, resp.read().decode("utf-8", "replace")
        except (http.client.BadStatusLine, http.client.RemoteDisconnected,
                ConnectionResetError) as exc:
            pytest.fail(f"server dropped the connection on {method} "
                        f"{path[:120]!r}: {exc!r}")
    finally:
        conn.close()


def _assert_protocol_shaped(status: int, text: str, ctx: str) -> None:
    assert status in (200, 400, 401, 403, 404, 405, 429, 500), \
        f"{ctx}: unexpected status {status}"
    if status == 200:
        for line in text.splitlines():
            if line.strip():
                json.loads(line)  # NDJSON or JSON — every line parses
        return
    doc = json.loads(text)  # error responses are a JSON document...
    assert isinstance(doc, dict), f"{ctx}: non-object error body"
    assert "errorCode" in doc and "message" in doc, \
        f"{ctx}: error body missing errorCode/message: {doc}"
    assert "Traceback" not in doc.get("message", ""), \
        f"{ctx}: traceback leaked to the client"


QUERY = "/shares/s/schemas/d/tables/t/query"
CHANGES = "/shares/s/schemas/d/tables/t/changes"


def _deep_predicate(depth: int) -> str:
    node: dict = {"op": "equal", "children": [
        {"op": "column", "name": "event_id", "valueType": "long"},
        {"op": "literal", "value": "1", "valueType": "long"}]}
    for _ in range(depth):
        node = {"op": "not", "children": [node]}
    return json.dumps(node)


def _page_token(srv) -> str:
    status, text = _raw(srv, "POST", QUERY,
                        body=json.dumps({"maxFiles": 1}).encode(),
                        headers={"Content-Type": "application/json"})
    assert status == 200
    for line in text.splitlines():
        doc = json.loads(line)
        tok = (doc.get("endStreamAction") or {}).get("nextPageToken")
        if tok:
            return tok
    pytest.skip("fixture produced no page token")


_CATEGORY = st.sampled_from([
    "garbage_path", "garbage_body", "truncated_body", "nondict_body",
    "deep_predicate", "huge_predicate", "bad_token", "mutated_token",
    "bad_params", "bad_changes", "bad_method", "unauth",
])


class TestRestFuzz:
    @settings(max_examples=520, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(category=_CATEGORY, data=st.data())
    def test_malformed_requests_stay_protocol_shaped(self, fuzz_server,
                                                     category, data):
        srv = fuzz_server
        jh = {"Content-Type": "application/json"}
        if category == "garbage_path":
            seg = data.draw(st.lists(
                st.text(
                    alphabet=st.characters(
                        min_codepoint=33, max_codepoint=126,
                        exclude_characters="/?#%"),
                    min_size=1, max_size=12),
                min_size=1, max_size=5))
            status, text = _raw(srv, data.draw(st.sampled_from(
                ["GET", "POST"])), "/" + "/".join(seg))
        elif category == "garbage_body":
            raw = data.draw(st.binary(min_size=1, max_size=256))
            status, text = _raw(srv, "POST", QUERY, body=raw, headers=jh)
        elif category == "truncated_body":
            full = json.dumps({"predicateHints": ["event_id > 3"],
                               "limitHint": 5, "maxFiles": 2})
            cut = data.draw(st.integers(1, len(full) - 1))
            status, text = _raw(srv, "POST", QUERY,
                                body=full[:cut].encode(), headers=jh)
        elif category == "nondict_body":
            doc = data.draw(st.one_of(
                st.integers(), st.text(max_size=20),
                st.lists(st.integers(), max_size=5), st.booleans(),
                st.none()))
            status, text = _raw(srv, "POST", QUERY,
                                body=json.dumps(doc).encode(), headers=jh)
        elif category == "deep_predicate":
            depth = data.draw(st.integers(101, 150))
            body = json.dumps({"jsonPredicateHints": _deep_predicate(depth)})
            status, text = _raw(srv, "POST", QUERY, body=body.encode(),
                                headers=jh)
            assert status == 400  # over the depth-100 protocol limit
        elif category == "huge_predicate":
            pad = "x" * data.draw(st.integers(1_048_577, 1_200_000))
            body = json.dumps({"jsonPredicateHints": json.dumps(
                {"op": "literal", "value": pad, "valueType": "string"})})
            status, text = _raw(srv, "POST", QUERY, body=body.encode(),
                                headers=jh)
            assert status == 400  # over the 1 MB protocol limit
        elif category == "bad_token":
            tok = data.draw(st.text(min_size=1, max_size=60))
            body = json.dumps({"pageToken": tok, "maxFiles": 1})
            status, text = _raw(srv, "POST", QUERY, body=body.encode(),
                                headers=jh)
            assert status in (400, 500) or status == 200
            assert status == 400 or status == 200 or json.loads(text)
        elif category == "mutated_token":
            tok = _page_token(srv)
            pos = data.draw(st.integers(0, len(tok) - 1))
            repl = data.draw(st.sampled_from("AZaz09_-"))
            mutated = tok[:pos] + repl + tok[pos + 1:]
            body = json.dumps({"pageToken": mutated, "maxFiles": 1})
            status, text = _raw(srv, "POST", QUERY, body=body.encode(),
                                headers=jh)
        elif category == "bad_params":
            field = data.draw(st.sampled_from(
                ["maxFiles", "limitHint", "version", "timestamp",
                 "startingVersion", "endingVersion"]))
            val = data.draw(st.one_of(
                st.text(max_size=20), st.integers(-10**19, 10**19),
                st.floats(allow_nan=True, allow_infinity=True),
                st.lists(st.integers(), max_size=3)))
            try:
                body = json.dumps({field: val})
            except ValueError:
                body = json.dumps({field: str(val)})
            status, text = _raw(srv, "POST", QUERY, body=body.encode(),
                                headers=jh)
        elif category == "bad_changes":
            q = data.draw(st.sampled_from([
                "startingVersion=abc", "startingVersion=-3",
                "endingVersion=99999999", "startingTimestamp=not-a-time",
                "startingVersion=2&endingVersion=1",
                "startingTimestamp=2091-01-01T00:00:00Z",
                "", "startingVersion=1&startingTimestamp=2020-01-01",
            ]))
            status, text = _raw(srv, "GET", f"{CHANGES}?{q}")
        elif category == "bad_method":
            m = data.draw(st.sampled_from(["PUT", "DELETE", "PATCH"]))
            status, text = _raw(srv, m, QUERY)
            assert status == 405
        else:  # unauth
            status, text = _raw(srv, "GET", "/shares", auth=False)
            assert status == 401
        _assert_protocol_shaped(status, text, f"{category}")

    def test_valid_query_still_green_after_fuzz(self, fuzz_server):
        """The sweep must not wedge the server: a well-formed query
        afterwards returns the normal NDJSON stream."""
        status, text = _raw(
            fuzz_server, "POST", QUERY,
            body=json.dumps({"limitHint": 5}).encode(),
            headers={"Content-Type": "application/json"})
        assert status == 200
        lines = [json.loads(x) for x in text.splitlines() if x.strip()]
        assert any("metaData" in d for d in lines)
        assert any("file" in d for d in lines)
