"""Async query facade — PROTOCOL.md:2313-3004 (``asyncquery`` header +
``queryStatus`` polling, dedup by ``idempotencyKey``).

The reference returns ``{queryStatus: {queryId}}`` and the client polls
``POST .../queries/{queryId}`` until the result set streams
(DeltaSharingService.scala:368-450). In-engine, a query is a Spark job —
already async by nature — so this facade runs ``query_actions`` on a
background thread, keeps a registry keyed by queryId, and deduplicates
resubmissions carrying the same idempotency key (same contract, no REST).
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field
from typing import Any

from delta_sharing_spark.table import SharedTable


@dataclass
class AsyncQuery:
    query_id: str
    status: str = "PENDING"  # PENDING -> COMPLETED | FAILED
    result: dict[str, Any] | None = None
    error: str | None = None
    # retained for result re-paging: a completed query's pages are served by
    # re-running query_actions pinned at the result's version with the
    # poll's maxFiles/pageToken (tokens bind the snapshot version, so pages
    # stay consistent)
    table: SharedTable | None = None
    kwargs: dict[str, Any] = field(default_factory=dict)
    finished_at: float | None = None  # time.monotonic() at completion
    _done: threading.Event = field(default_factory=threading.Event)

    def wait(self, timeout: float | None = None) -> bool:
        return self._done.wait(timeout)


class AsyncQueryManager:
    """Submit/poll async table queries with idempotency-key dedup.

    Bounded registry: finished (COMPLETED/FAILED) queries evict oldest-
    first once ``max_finished`` are retained, and — independently — once
    they have been finished for longer than ``finished_ttl_s`` (age bound:
    a quiet server does not hold completed result plans forever; polling
    an expired queryId gets the same unknown-id error as a bogus one, and
    the client resubmits under its idempotency key). In-flight queries are
    never evicted."""

    def __init__(self, max_finished: int = 256,
                 finished_ttl_s: float | None = 3600.0) -> None:
        self._queries: dict[str, AsyncQuery] = {}
        self._by_idempotency: dict[str, tuple[str, str]] = {}
        self._max_finished = max_finished
        self._finished_ttl_s = finished_ttl_s
        self._lock = threading.Lock()

    def _drop(self, qid: str) -> None:
        # caller holds the lock
        self._queries.pop(qid)
        for key, (known_qid, _fp) in list(self._by_idempotency.items()):
            if known_qid == qid:
                self._by_idempotency.pop(key)

    def _evict_finished(self) -> None:
        # caller holds the lock; dict preserves insertion order
        import time

        if self._finished_ttl_s is not None:
            cutoff = time.monotonic() - self._finished_ttl_s
            for qid, q in list(self._queries.items()):
                if q.finished_at is not None and q.finished_at < cutoff:
                    self._drop(qid)
        finished = [qid for qid, q in self._queries.items()
                    if q.status in ("COMPLETED", "FAILED")]
        for qid in finished[:max(0, len(finished) - self._max_finished)]:
            self._drop(qid)

    @staticmethod
    def _fingerprint(table: SharedTable, kwargs: dict) -> str:
        import json

        return json.dumps([table.log.path, kwargs], sort_keys=True,
                          default=str)

    def submit(self, table: SharedTable, idempotency_key: str | None = None,
               **query_kwargs: Any) -> AsyncQuery:
        fp = self._fingerprint(table, query_kwargs)
        with self._lock:
            # evict BEFORE the dedup lookup: a TTL-expired query must not
            # be returned for a resubmission under its old idempotency key
            self._evict_finished()
            if idempotency_key is not None:
                existing = self._by_idempotency.get(idempotency_key)
                # dedup only same-table same-params resubmissions
                # (PROTOCOL.md:2154-2156; different params under a reused
                # key is undefined — we start a fresh query)
                if existing is not None and existing[1] == fp:
                    return self._queries[existing[0]]
            q = AsyncQuery(query_id=uuid.uuid4().hex, table=table,
                           kwargs=dict(query_kwargs))
            self._queries[q.query_id] = q
            if idempotency_key is not None:
                self._by_idempotency[idempotency_key] = (q.query_id, fp)

        def run() -> None:
            import time

            try:
                q.result = table.query_actions(**query_kwargs)
                q.status = "COMPLETED"
            except Exception as exc:  # surfaced via poll, like errorMessage
                q.error = str(exc)
                q.status = "FAILED"
            finally:
                q.finished_at = time.monotonic()
                q._done.set()

        threading.Thread(target=run, daemon=True).start()
        return q

    def poll(self, query_id: str) -> AsyncQuery:
        # the TTL is enforced here too: a quiet server (no submissions)
        # must still expire finished result plans, and polling an expired
        # queryId gets the same unknown-id error as a bogus one
        with self._lock:
            self._evict_finished()
            q = self._queries.get(query_id)
        if q is None:
            raise KeyError(f"unknown queryId {query_id!r}")
        return q
