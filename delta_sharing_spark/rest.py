"""HTTP data-plane client with retry/backoff — the network twin of the
in-process ``SharingClient``.

Mirrors the reference's REST client stack:

- retry semantics: ``RetryUtils.runWithExponentialBackoff``
  (client/.../util/RetryUtils.scala:30-104) — retry 429 and 5xx plus
  transient connection errors, exponential sleep doubling from an initial
  interval, bounded by max retries AND max total duration;
- python connector shape: ``python/delta_sharing/rest_client.py:97-120``
  (``retry_with_exponential_backoff`` decorator, 100 ms initial sleep) and
  its expired-token error text on 401 with an expired profile;
- endpoints: ListShares/ListSchemas/ListTables/ListAllTables +
  QueryTableVersion/Metadata/QueryTable/QueryTableChanges over NDJSON
  (rest_client.py:214-480).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid
from typing import Any

from delta_sharing_spark.auth import AuthCredentialProvider
from delta_sharing_spark.retry import (
    HttpStatusError,
    RetryConfig,
    run_with_backoff,
    should_retry,
)

__all__ = [
    "DataSharingRestClient",
    "HttpStatusError",
    "RetryConfig",
    "run_with_backoff",
    "should_retry",
]


# the reader features this client implements end-to-end (DV-masked scans,
# physical-name column mapping, TIMESTAMP_NTZ values); declared with
# delta-format requests like the reference client's readerFeatures string
READER_FEATURES = "deletionvectors,columnmapping,timestampntz"


class MissingEndStreamActionError(RuntimeError):
    """Server advertised includeendstreamaction=true but the response did
    not end with an endStreamAction — a truncated stream
    (MissingEndStreamActionException, DeltaSharingClient.scala:1671-1676)."""


def check_end_stream_action(
        resp_headers: dict[str, str],
        lines: list[dict]) -> list[dict]:
    """Client-side truncation check (checkEndStreamAction,
    DeltaSharingClient.scala:1661-1698): when the RESPONDED capabilities
    carry includeendstreamaction=true, the last line must be an
    endStreamAction — raise if missing, surface an embedded server error,
    and strip the trailer; a server that did not echo the header is
    tolerated (reference logs a warning and proceeds)."""
    caps = (resp_headers.get("delta-sharing-capabilities") or "") \
        .replace(" ", "").lower()
    responded = None
    for part in caps.split(";"):
        if part.startswith("includeendstreamaction="):
            responded = part.split("=", 1)[1] == "true"
    if responded is not True:
        return lines
    last = lines[-1] if lines else None
    esa = (last or {}).get("endStreamAction")
    if esa is None:
        raise MissingEndStreamActionError(
            "Client sets includeendstreamaction=true, server responded "
            f"with the header set to true and {len(lines)} lines, and "
            f"last line as [{json.dumps(last) if last else 'empty'}].")
    if esa.get("errorMessage"):
        code = esa.get("httpStatusErrorCode")
        raise HttpStatusError(
            f"Server Exception[{code if code is not None else ''}]: "
            f"{esa['errorMessage']}", code)
    return lines[:-1]


def _check_query_pending(
        lines: list[dict]) -> tuple[list[dict], str | None, bool]:
    """First-line queryStatus detection (checkQueryPending,
    DeltaSharingClient.scala:1062-1076): a pending/failed async response
    is a single queryStatus line; a finished one IS the sync response."""
    if not lines or "queryStatus" not in lines[0]:
        return lines, None, False
    status = lines[0]["queryStatus"]
    if status.get("status") == "failed":
        raise RuntimeError(
            f"async query failed: {status.get('errorMessage')}")
    qid = status.get("queryId")
    if qid is None:
        raise RuntimeError(
            "QueryId is not returned in the first line of the response."
            + json.dumps(lines[0]))
    return lines[1:], qid, True


class DataSharingRestClient:
    """Thin retried HTTP transport + the sharing endpoints
    (rest_client.py:214-480).

    ``base_url`` is the profile ``endpoint``; every call goes through
    :func:`run_with_backoff`, so a 429/503 under load is retried instead of
    surfacing to the caller — the reference wraps every data route the same
    way (rest_client.py's ``@retry_with_exponential_backoff`` on each
    ``list_*``/``query_*``)."""

    def __init__(self, base_url: str,
                 auth_provider: AuthCredentialProvider | None = None,
                 retry_config: RetryConfig | None = None,
                 profile=None):
        self.base_url = base_url.rstrip("/")
        self.auth_provider = auth_provider
        self.retry_config = retry_config or RetryConfig()
        self.profile = profile

    # ------------------------------------------------------------ transport

    def _request(self, method: str, path: str,
                 body: dict | None = None,
                 headers: dict[str, str] | None = None
                 ) -> tuple[int, dict[str, str], str]:
        url = f"{self.base_url}{path}"

        def once() -> tuple[int, dict[str, str], str]:
            hdrs: dict[str, str] = dict(headers or {})
            if self.auth_provider is not None:
                self.auth_provider.add_auth_header(hdrs)
            data = None
            if body is not None:
                data = json.dumps(body).encode()
                hdrs["Content-Type"] = "application/json"
            req = urllib.request.Request(url, data=data, method=method,
                                         headers=hdrs)
            try:
                with urllib.request.urlopen(
                        req, timeout=self.retry_config.request_timeout_s
                ) as resp:
                    return (resp.status,
                            {k.lower(): v for k, v in resp.headers.items()},
                            resp.read().decode())
            except urllib.error.HTTPError as e:
                detail = ""
                try:
                    detail = e.read().decode()
                except Exception:  # noqa: BLE001
                    pass
                raise HttpStatusError(
                    f"HTTP request failed with status: {e.code} {detail}",
                    e.code) from e

        try:
            return run_with_backoff(once, self.retry_config)
        except HttpStatusError as e:
            # 401 on an expired profile surfaces the token expiry, matching
            # rest_client.py:108-114's _error_on_expired_token wrapper
            if e.status_code in (401, 403) and self.profile is not None:
                exp = getattr(self.profile, "expiration_time", None)
                if exp is not None and _is_past(exp):
                    raise HttpStatusError(
                        "It may be caused by an expired token as it has "
                        f"expired at {exp}", e.status_code) from e
            raise

    def _get_json(self, path: str) -> dict:
        _s, _h, body = self._request("GET", path)
        return json.loads(body) if body else {}

    def _ndjson(self, method: str, path: str, body: dict | None = None,
                headers: dict[str, str] | None = None
                ) -> tuple[dict[str, str], list[dict]]:
        _s, resp_headers, text = self._request(method, path, body=body,
                                               headers=headers)
        return resp_headers, [json.loads(line)
                              for line in text.splitlines() if line]

    # ------------------------------------------------------------- catalog

    def _paged(self, path: str, key: str = "items") -> list[dict]:
        out: list[dict] = []
        token: str | None = None
        while True:
            sep = "&" if "?" in path else "?"
            page_path = path + (f"{sep}pageToken={urllib.parse.quote(token)}"
                                if token else "")
            resp = self._get_json(page_path)
            out += resp.get(key, [])
            token = resp.get("nextPageToken")
            if not token:
                return out

    def list_shares(self) -> list[dict]:
        return self._paged("/shares")

    def list_schemas(self, share: str) -> list[dict]:
        return self._paged(f"/shares/{share}/schemas")

    def list_tables(self, share: str, schema: str) -> list[dict]:
        return self._paged(f"/shares/{share}/schemas/{schema}/tables")

    def list_all_tables(self, share: str) -> list[dict]:
        return self._paged(f"/shares/{share}/all-tables")

    # ---------------------------------------------------------- data plane

    def query_table_version(self, share: str, schema: str, table: str,
                            starting_timestamp: str | None = None) -> int:
        path = f"/shares/{share}/schemas/{schema}/tables/{table}/version"
        if starting_timestamp:
            path += ("?startingTimestamp="
                     + urllib.parse.quote(starting_timestamp))
        _s, headers, _b = self._request("GET", path)
        return int(headers["delta-table-version"])

    def query_table_metadata(self, share: str, schema: str, table: str,
                             version: int | None = None,
                             timestamp: str | None = None) -> list[dict]:
        path = f"/shares/{share}/schemas/{schema}/tables/{table}/metadata"
        params = []
        if version is not None:
            params.append(f"version={version}")
        if timestamp is not None:
            params.append("timestamp=" + urllib.parse.quote(timestamp))
        if params:
            path += "?" + "&".join(params)
        _h, lines = self._ndjson("GET", path)
        return lines

    def list_files_in_table(
        self, share: str, schema: str, table: str,
        predicate_hints: list[str] | None = None,
        json_predicate_hints: str | None = None,
        limit_hint: int | None = None,
        version: int | None = None,
        timestamp: str | None = None,
        max_files: int | None = None,
        page_token: str | None = None,
        response_formats: str | None = None,
        starting_version: int | None = None,
        ending_version: int | None = None,
        include_historical_protocol: bool = False,
        include_end_stream_action: bool = False,
        async_query: bool = False,
        poll_interval_s: float = 0.05,
        max_duration_s: float = 600.0,
    ) -> tuple[dict[str, str], list[dict]]:
        body: dict[str, Any] = {}
        if predicate_hints is not None:
            body["predicateHints"] = predicate_hints
        if json_predicate_hints is not None:
            body["jsonPredicateHints"] = json_predicate_hints
        if limit_hint is not None:
            body["limitHint"] = limit_hint
        if version is not None:
            body["version"] = version
        if timestamp is not None:
            body["timestamp"] = timestamp
        if max_files is not None:
            body["maxFiles"] = max_files
        if page_token is not None:
            body["pageToken"] = page_token
        if starting_version is not None:
            # version-range form (data-change files since startingVersion;
            # ref DeltaSharingClient.scala:548-569 getFiles(startingVersion,
            # endingVersion))
            body["startingVersion"] = starting_version
        if ending_version is not None:
            body["endingVersion"] = ending_version
        if include_historical_protocol:
            body["includeHistoricalProtocol"] = True
        headers = {}
        caps = []
        if response_formats:
            caps.append(f"responseformat={response_formats}")
            if "delta" in response_formats:
                # declare the reader features this client implements (the
                # reference client sends its list with delta-format
                # requests, DeltaSharingClient.scala:1507-1510); servers
                # treat a declared list as authoritative
                caps.append(f"readerfeatures={READER_FEATURES}")
        if async_query:
            # async read (PROTOCOL.md:2313-2350; client polling loop
            # DeltaSharingClient.scala:1086-1137 getNDJsonWithAsync):
            # submit with asyncquery=true + a fresh idempotencyKey, then
            # poll Get Query Info until the sync-shaped response streams.
            # The reference does NOT set endstreamaction on async queries
            # (DeltaSharingClient.scala:725-726)
            caps.append("asyncquery=true")
            body.setdefault("idempotencyKey", uuid.uuid4().hex)
        elif include_end_stream_action:
            caps.append("includeendstreamaction=true")
        if caps:
            headers["delta-sharing-capabilities"] = ";".join(caps)
        resp_headers, lines = self._ndjson(
            "POST",
            f"/shares/{share}/schemas/{schema}/tables/{table}/query",
            body=body, headers=headers)
        if not async_query:
            if include_end_stream_action:
                lines = check_end_stream_action(resp_headers, lines)
            return resp_headers, lines
        lines, query_id, pending = _check_query_pending(lines)
        start = time.monotonic()
        while pending:
            if time.monotonic() - start > max_duration_s:
                # reference error text (DeltaSharingClient.scala:1112-1115)
                raise TimeoutError(
                    f"Query is timed out after {int(max_duration_s * 1000)}"
                    " ms. Please try again later.")
            time.sleep(poll_interval_s)
            poll_body: dict[str, Any] = {}
            if max_files is not None:
                poll_body["maxFiles"] = max_files
            if page_token is not None:
                poll_body["pageToken"] = page_token
            resp_headers, raw = self._ndjson(
                "POST",
                f"/shares/{share}/schemas/{schema}/tables/{table}"
                f"/queries/{query_id}",
                body=poll_body)
            new_lines, returned_id, pending = _check_query_pending(raw)
            if pending and returned_id != query_id:
                raise RuntimeError(
                    "QueryId is not consistent in the response. "
                    f"Expected: {query_id}, Actual: {returned_id}")
            lines = new_lines
        return resp_headers, lines

    def list_table_changes(
        self, share: str, schema: str, table: str,
        starting_version: int | None = None,
        ending_version: int | None = None,
        starting_timestamp: str | None = None,
        ending_timestamp: str | None = None,
        response_formats: str | None = None,
        include_historical_metadata: bool = False,
        include_end_stream_action: bool = False,
        include_historical_protocol: bool = False,
        max_files: int | None = None,
        page_token: str | None = None,
    ) -> list[dict]:
        params = []
        if starting_version is not None:
            params.append(f"startingVersion={starting_version}")
        if ending_version is not None:
            params.append(f"endingVersion={ending_version}")
        if include_historical_metadata:
            params.append("includeHistoricalMetadata=true")
        if include_historical_protocol:
            params.append("includeHistoricalProtocol=true")
        if max_files is not None:
            params.append(f"maxFiles={max_files}")
        if page_token is not None:
            params.append("pageToken=" + urllib.parse.quote(page_token))
        if starting_timestamp is not None:
            params.append("startingTimestamp="
                          + urllib.parse.quote(starting_timestamp))
        if ending_timestamp is not None:
            params.append("endingTimestamp="
                          + urllib.parse.quote(ending_timestamp))
        q = ("?" + "&".join(params)) if params else ""
        headers = {}
        caps = []
        if response_formats:
            caps.append(f"responseformat={response_formats}")
            if "delta" in response_formats:
                caps.append(f"readerfeatures={READER_FEATURES}")
        if include_end_stream_action:
            caps.append("includeendstreamaction=true")
        if caps:
            headers["delta-sharing-capabilities"] = ";".join(caps)
        resp_h, lines = self._ndjson(
            "GET",
            f"/shares/{share}/schemas/{schema}/tables/{table}/changes{q}",
            headers=headers)
        if include_end_stream_action:
            lines = check_end_stream_action(resp_h, lines)
        return lines


def _is_past(expiration_time: str) -> bool:
    from datetime import datetime, timezone

    try:
        exp = datetime.fromisoformat(expiration_time.replace("Z", "+00:00"))
    except ValueError:
        return False
    if exp.tzinfo is None:
        exp = exp.replace(tzinfo=timezone.utc)
    return exp < datetime.now(tz=timezone.utc)
