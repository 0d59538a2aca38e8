"""Auth credential providers for profile-based access.

Mirrors the reference client's auth stack
(client/src/main/scala/io/delta/sharing/client/auth/):

- ``BearerTokenAuthProvider`` — static token with optional ISO-8601
  ``expirationTime`` (BearerTokenAuthProvider.scala:26-47).
- ``OAuthClientCredentialsAuthProvider`` — RFC 6749 client-credentials
  grant against the profile's ``tokenEndpoint``; the access token is
  cached and refreshed when it is within ``token_renewal_threshold_in_
  seconds`` of expiry (OAuthClientCredentialsAuthProvider.scala:27-120,
  OAuthClient.scala:31-120).
- ``create_credential_provider`` — profile-type dispatch
  (AuthCredentialProviderFactory.scala:28-44).

Token exchange retries temporary failures (connection errors, 429, 5xx)
with exponential backoff, like the reference's RetryUtils wrapping of the
token call (OAuthClient.scala:58-61).
"""

from __future__ import annotations

import base64
import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from datetime import datetime, timezone


@dataclass(frozen=True)
class AuthConfig:
    """Defaults mirror AuthCredentialProviderFactory.scala:23-25."""

    token_exchange_max_retries: int = 5
    token_exchange_max_retry_duration_seconds: int = 60
    token_renewal_threshold_in_seconds: int = 600


@dataclass
class OAuthClientCredentials:
    access_token: str
    expires_in: int  # seconds
    creation_timestamp: int  # ms epoch


class OAuthTokenError(Exception):
    pass


class OAuthClient:
    """Client-credentials token exchange (OAuthClient.scala:31-120)."""

    def __init__(self, token_endpoint: str, client_id: str,
                 client_secret: str, scope: str | None = None,
                 auth_config: AuthConfig | None = None):
        self.token_endpoint = token_endpoint
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.auth_config = auth_config or AuthConfig()

    def client_credentials(self) -> OAuthClientCredentials:
        """Token exchange through the shared retry helper (retry.py — the
        same RetryUtils semantics the data routes use): retry 429/5xx and
        connection errors, exponential backoff, bounded by the auth
        config's max retries and total duration
        (OAuthClient.scala:58-61)."""
        from delta_sharing_spark.retry import RetryConfig, run_with_backoff

        creds = base64.b64encode(
            f"{self.client_id}:{self.client_secret}".encode()).decode()
        body = "grant_type=client_credentials"
        if self.scope:
            body += f"&scope={urllib.parse.quote(self.scope)}"
        req = urllib.request.Request(
            self.token_endpoint, data=body.encode(), method="POST",
            headers={
                "accept": "application/json",
                "authorization": f"Basic {creds}",
                "content-type": "application/x-www-form-urlencoded",
            })

        def once() -> OAuthClientCredentials:
            with urllib.request.urlopen(
                    req, timeout=RetryConfig().request_timeout_s) as resp:
                return self._parse(resp.read().decode())

        try:
            return run_with_backoff(once, RetryConfig(
                num_retries=self.auth_config.token_exchange_max_retries,
                initial_sleep_ms=100,
                max_duration_ms=self.auth_config
                .token_exchange_max_retry_duration_seconds * 1000,
            ))
        except urllib.error.HTTPError as e:
            raise OAuthTokenError(
                "Failed to get OAuth token from token endpoint: "
                f"status {e.code}") from e
        except urllib.error.URLError as e:
            raise OAuthTokenError(
                f"Failed to reach OAuth token endpoint: {e}") from e

    @staticmethod
    def _parse(response: str) -> OAuthClientCredentials:
        """RFC 6749 §5.1; tolerate string ``expires_in`` like the reference
        (OAuthClient.scala:95-116, some IdPs return "3600")."""
        if not response:
            raise OAuthTokenError("Empty response from OAuth token endpoint")
        node = json.loads(response)
        token = node.get("access_token")
        if not isinstance(token, str):
            raise OAuthTokenError(
                "Missing 'access_token' field in OAuth token response")
        if "expires_in" not in node:
            raise OAuthTokenError(
                "Missing 'expires_in' field in OAuth token response")
        raw = node["expires_in"]
        try:
            expires_in = int(raw)
        except (TypeError, ValueError):
            raise OAuthTokenError(
                "Invalid 'expires_in' field in OAuth token response")
        return OAuthClientCredentials(
            access_token=token, expires_in=expires_in,
            creation_timestamp=int(time.time() * 1000))


class AuthCredentialProvider:
    def add_auth_header(self, headers: dict) -> None:
        raise NotImplementedError

    def is_expired(self) -> bool:
        return False

    def get_expiration_time(self) -> str | None:
        return None


@dataclass
class BearerTokenAuthProvider(AuthCredentialProvider):
    """Static bearer token (BearerTokenAuthProvider.scala:26-47)."""

    bearer_token: str
    expiration_time: str | None = None

    def add_auth_header(self, headers: dict) -> None:
        headers["Authorization"] = f"Bearer {self.bearer_token}"

    def is_expired(self) -> bool:
        if not self.expiration_time:
            return False
        try:
            exp = datetime.fromisoformat(
                self.expiration_time.replace("Z", "+00:00"))
        except ValueError as e:
            # a malformed expirationTime must surface the broken profile,
            # not fail open as a never-expiring token
            raise ValueError(
                "profile has unparseable expirationTime "
                f"{self.expiration_time!r}: {e}") from e
        if exp.tzinfo is None:
            # zone-less expirationTime means UTC (protocol timestamps
            # are UTC-adjusted); never compare against local time
            exp = exp.replace(tzinfo=timezone.utc)
        return exp < datetime.now(tz=timezone.utc)

    def get_expiration_time(self) -> str | None:
        return self.expiration_time


@dataclass
class OAuthClientCredentialsAuthProvider(AuthCredentialProvider):
    """Cached client-credentials token with threshold refresh
    (OAuthClientCredentialsAuthProvider.scala:27-120)."""

    oauth_client: OAuthClient
    auth_config: AuthConfig = field(default_factory=AuthConfig)
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)
    _current: OAuthClientCredentials | None = None

    def add_auth_header(self, headers: dict) -> None:
        token = self._maybe_refresh_token()
        headers["Authorization"] = f"Bearer {token.access_token}"

    def _maybe_refresh_token(self) -> OAuthClientCredentials:
        with self._lock:
            if self._current is not None and \
                    not self.needs_refresh(self._current):
                return self._current
            self._current = self.oauth_client.client_credentials()
            return self._current

    def needs_refresh(self, token: OAuthClientCredentials) -> bool:
        """OAuthClientCredentialsAuthProvider.scala:88-92."""
        now_ms = int(time.time() * 1000)
        expiration = token.creation_timestamp + token.expires_in * 1000
        threshold_ms = self.auth_config.token_renewal_threshold_in_seconds \
            * 1000
        return expiration - now_ms < threshold_ms


@dataclass
class BasicAuthProvider(AuthCredentialProvider):
    """HTTP Basic credentials (reference ``basic`` profile type)."""

    username: str
    password: str

    def add_auth_header(self, headers: dict) -> None:
        creds = base64.b64encode(
            f"{self.username}:{self.password}".encode()).decode()
        headers["Authorization"] = f"Basic {creds}"


def create_credential_provider(profile,
                               auth_config: AuthConfig | None = None
                               ) -> AuthCredentialProvider:
    """Profile-type dispatch (AuthCredentialProviderFactory.scala:28-44)."""
    ptype = getattr(profile, "type", None) or "bearer_token"
    if ptype == "oauth_client_credentials":
        client = OAuthClient(
            token_endpoint=profile.token_endpoint,
            client_id=profile.client_id,
            client_secret=profile.client_secret,
            scope=getattr(profile, "scope", None),
            auth_config=auth_config,
        )
        return OAuthClientCredentialsAuthProvider(
            oauth_client=client, auth_config=auth_config or AuthConfig())
    if ptype == "bearer_token":
        return BearerTokenAuthProvider(
            bearer_token=profile.bearer_token or "",
            expiration_time=getattr(profile, "expiration_time", None))
    if ptype == "basic":
        return BasicAuthProvider(username=profile.username or "",
                                 password=profile.password or "")
    if ptype == "oauth_jwt_bearer_private_key_jwt":
        raise NotImplementedError(
            "oauth_jwt_bearer_private_key_jwt requires a JWT signing "
            "library (not available in this environment); the profile "
            "parses, but no credential provider can be constructed")
    raise ValueError(
        f"The current release does not supports {ptype} type. "
        "Please check type.")
