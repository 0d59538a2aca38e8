"""Shared HTTP retry/backoff (ref RetryUtils.scala:30-104 and the python
connector's retry_with_exponential_backoff, rest_client.py:97-120):
retry 429 and 5xx plus transient connection errors with exponential sleep,
bounded by max retries AND max total duration. Used by the OAuth token
exchange (auth.py) and every REST data route (rest.py)."""

from __future__ import annotations

import time
import urllib.error
from dataclasses import dataclass
from typing import Any, Callable


class HttpStatusError(Exception):
    """Non-2xx response with its status code (ref UnexpectedHttpStatus,
    RetryUtils.scala:105-107)."""

    def __init__(self, message: str, status_code: int):
        super().__init__(message)
        self.status_code = status_code


@dataclass(frozen=True)
class RetryConfig:
    """Defaults follow the python connector (rest_client.py: 100 ms initial
    sleep) and the scala client's 10-minute total-duration cap.
    ``request_timeout_s`` bounds a single connect/read (the reference
    clients set both; NetworkConfig timeoutInSeconds default 320) — without
    it a black-holed server blocks forever, since the retry loop only
    measures time BETWEEN completed attempts."""

    num_retries: int = 3
    initial_sleep_ms: int = 100
    max_duration_ms: int = 600_000  # <= 10 min total, like the reference
    request_timeout_s: float = 320.0  # ref NetworkConfig default

    def sleeper(self, ms: int) -> None:  # overridable in tests
        time.sleep(ms / 1000.0)

    @classmethod
    def from_spark_conf(cls, conf) -> "RetryConfig":
        """Build from the reference connector's conf names
        (ConfUtils.scala:27-49): ``spark.delta.sharing.network.
        {numRetries, maxRetryDuration, retrySleepInterval, timeout}``.
        ``timeout`` accepts the reference's duration spelling
        ("320s"/"5000ms") or a bare-seconds number."""
        pre = "spark.delta.sharing.network."
        d = cls()

        def geti(key: str, default: int) -> int:
            return int(conf.get(pre + key, str(default)))

        raw = str(conf.get(pre + "timeout", "320s")).strip().lower()
        import re as _re

        m = _re.fullmatch(r"([0-9.]+)\s*(ms|s|m|h|d)?", raw)
        if m is None:
            raise ValueError(
                f"unparseable {pre}timeout {raw!r}; expected e.g. "
                "'320s', '5000ms', '5m', '1h', or bare seconds")
        mult = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0,
                "d": 86400.0, None: 1.0}[m.group(2)]
        timeout_s = float(m.group(1)) * mult
        return cls(
            num_retries=geti("numRetries", d.num_retries),
            initial_sleep_ms=geti("retrySleepInterval",
                                  d.initial_sleep_ms),
            max_duration_ms=geti("maxRetryDuration", d.max_duration_ms),
            request_timeout_s=timeout_s,
        )


def should_retry(exc: Exception) -> bool:
    """RetryUtils.shouldRetry (RetryUtils.scala:68-104): 429 yes, 5xx yes,
    other statuses no; transient connection errors yes. Permanent
    connection-level failures (bad certificate, NXDOMAIN) surface
    immediately — only genuinely transient classes earn the backoff cycle,
    like the reference's explicit transient-exception list."""
    import socket
    import ssl

    if isinstance(exc, HttpStatusError):
        return exc.status_code == 429 or 500 <= exc.status_code < 600
    if isinstance(exc, urllib.error.HTTPError):
        return exc.code == 429 or 500 <= exc.code < 600
    if isinstance(exc, (ConnectionResetError, TimeoutError)):
        return True
    if isinstance(exc, urllib.error.URLError):
        reason = exc.reason
        if isinstance(reason, ssl.SSLError):
            return False  # bad certificate / TLS mismatch: permanent
        if isinstance(reason, socket.gaierror):
            # DNS: EAI_AGAIN is the transient resolver failure; NXDOMAIN
            # (EAI_NONAME) and friends are permanent
            return reason.errno == socket.EAI_AGAIN
        return isinstance(reason, (ConnectionError, TimeoutError,
                                   socket.timeout, OSError))
    return False


def run_with_backoff(func: Callable[[], Any],
                     config: RetryConfig | None = None) -> Any:
    """Run ``func``, retrying retryable failures with exponential backoff
    (RetryUtils.scala:30-66: attempt, on retryable error sleep and double,
    stop when retries or the duration budget are exhausted)."""
    config = config or RetryConfig()
    times = 0
    sleep_ms = config.initial_sleep_ms
    start = time.monotonic()
    while True:
        times += 1
        try:
            return func()
        except Exception as e:  # noqa: BLE001 — mirror reference catch-all
            total_ms = (time.monotonic() - start) * 1000
            if should_retry(e) and times <= config.num_retries \
                    and total_ms <= config.max_duration_ms:
                config.sleeper(sleep_ms)
                sleep_ms *= 2
            else:
                raise
