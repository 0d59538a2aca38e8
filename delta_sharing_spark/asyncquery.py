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
    _done: threading.Event = field(default_factory=threading.Event)

    def wait(self, timeout: float | None = None) -> bool:
        return self._done.wait(timeout)


class AsyncQueryManager:
    """Submit/poll async table queries with idempotency-key dedup."""

    def __init__(self) -> None:
        self._queries: dict[str, AsyncQuery] = {}
        self._by_idempotency: dict[str, str] = {}
        self._lock = threading.Lock()

    def submit(self, table: SharedTable, idempotency_key: str | None = None,
               **query_kwargs: Any) -> AsyncQuery:
        with self._lock:
            if idempotency_key is not None:
                existing = self._by_idempotency.get(idempotency_key)
                if existing is not None:
                    return self._queries[existing]  # dedup resubmission
            q = AsyncQuery(query_id=uuid.uuid4().hex)
            self._queries[q.query_id] = q
            if idempotency_key is not None:
                self._by_idempotency[idempotency_key] = q.query_id

        def run() -> None:
            try:
                q.result = table.query_actions(**query_kwargs)
                q.status = "COMPLETED"
            except Exception as exc:  # surfaced via poll, like errorMessage
                q.error = str(exc)
                q.status = "FAILED"
            finally:
                q._done.set()

        threading.Thread(target=run, daemon=True).start()
        return q

    def poll(self, query_id: str) -> AsyncQuery:
        q = self._queries.get(query_id)
        if q is None:
            raise KeyError(f"unknown queryId {query_id!r}")
        return q
