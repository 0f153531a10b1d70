"""Generic HTTP hook (SURVEY.md §2.B sink family's non-sink sibling).

The reference's jobs don't only push batches: they also probe APIs with
arbitrary methods before/around the push (reference:
martech_pipelines/hooks/http.py:24-131 — method-parameterized run(),
Connection-driven base URL/auth/default headers;
:193-217 — run_with_advanced_retry). The batch sinks in
operators/sinks.py are deliberately POST-only executor-side paths; this
module is the DRIVER-SIDE control-plane twin: one-off requests, health
probes, API polling between Spark actions.

Engine re-expression, not a port:

- stdlib ``urllib`` transport (injectable for tests) instead of a
  ``requests.Session`` — no extra dependency, and the transport seam is
  what makes the hook testable without network.
- retry policy reuses the SAME classification as the executor-side
  sinks (``operators/sinks.py::_post_with_retry``): connection errors /
  5xx / 429 back off and retry, other 4xx fail fast — instead of the
  reference's tenacity passthrough where the caller hand-assembles
  retry args (hooks/http.py:193-217).

Reference semantics preserved (hooks/http.py):
- base URL: ``host`` containing "://" wins verbatim, else
  ``schema or "http"`` + host; ``port`` appended (:51-61).
- connection ``extra`` JSON becomes default headers; invalid extra is
  ignored with a warning, not an error (:64-70).
- login/password become basic auth (:62-63).
- URL join: slash-insert between base and endpoint; an endpoint that
  already starts with "http" is absolute (:104-112).
- GET sends ``data`` as query params, HEAD sends none, every other
  method sends it as the body (:114-126).
- ``check_response`` (default on) raises ``"<status>:<reason>"`` on
  non-2xx/3xx (:132-145); ``extra_options={"check_response": False}``
  returns the response unchecked.
"""

from __future__ import annotations

import base64
import json
import logging
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

from martech_pipelines_spark.operators.connections import (
    Connection,
    ConnectionRegistry,
)
from martech_pipelines_spark.operators.sinks import HttpClientError

log = logging.getLogger(__name__)

RETRYABLE_STATUSES = frozenset({429}) # plus every 5xx — see _classify


@dataclass
class HttpResponse:
    """Minimal response: status + reason + headers + raw body."""

    status: int
    reason: str
    headers: dict[str, str]
    body: bytes = b""

    @property
    def text(self) -> str:
        return self.body.decode("utf-8", errors="replace")

    def json(self):
        return json.loads(self.body)

    @property
    def ok(self) -> bool:
        return 200 <= self.status < 400


# transport(method, url, body, headers, timeout) -> HttpResponse
Transport = Callable[[str, str, bytes | None, dict, float], HttpResponse]


def urllib_transport(
    method: str, url: str, body: bytes | None, headers: dict, timeout: float
) -> HttpResponse:
    """Default stdlib transport. Captures HTTP error statuses instead of
    raising so the hook's classification stays authoritative (same
    contract as sinks.default_post); connection-level failures propagate
    as URLError/OSError for the retry path."""
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            return HttpResponse(
                resp.status, resp.reason or "", dict(resp.headers), resp.read()
            )
    except urllib.error.HTTPError as e:
        return HttpResponse(e.code, e.reason or "", dict(e.headers or {}), e.read())


def _classify(status: int) -> str:
    """Shared with the executor-side sinks: 'ok' | 'retry' | 'fatal'."""
    if status < 400:
        return "ok"
    if status >= 500 or status in RETRYABLE_STATUSES:
        return "retry"
    return "fatal"


@dataclass
class RetryArgs:
    """run_with_advanced_retry knobs (reference passes raw tenacity args,
    hooks/http.py:193-217; here the policy is explicit and bounded)."""

    max_attempts: int = 3
    backoff_base_s: float = 0.5
    retry_statuses: frozenset[int] = field(default_factory=frozenset)


class HttpHook:
    """Arbitrary-method HTTP hook over a resolved Connection.

    >>> hook = HttpHook(registry, method="GET", http_conn_id="api")
    >>> resp = hook.run("v1/health", data={"deep": "1"})
    """

    def __init__(
        self,
        registry: ConnectionRegistry | None = None,
        method: str = "POST",
        http_conn_id: str = "http_default",
        transport: Transport = urllib_transport,
    ) -> None:
        self.method = method.upper()
        self.http_conn_id = http_conn_id
        self._registry = registry
        self._transport = transport
        self.base_url: str = ""
        self._default_headers: dict[str, str] = {}
        if registry is not None and http_conn_id:
            self._configure(registry.get(http_conn_id))

    def _configure(self, conn: Connection) -> None:
        if conn.host and "://" in conn.host:
            self.base_url = conn.host
        else:
            schema = conn.schema or "http"
            self.base_url = f"{schema}://{conn.host or ''}"
        if conn.port:
            self.base_url = f"{self.base_url}:{conn.port}"
        if conn.login:
            token = base64.b64encode(
                f"{conn.login}:{conn.password or ''}".encode()
            ).decode()
            self._default_headers["Authorization"] = f"Basic {token}"
        if conn.extra:
            extras = conn.extra_dejson
            if extras:
                self._default_headers.update(
                    {str(k): str(v) for k, v in extras.items()}
                )
            else:
                log.warning(
                    "Connection to %s has invalid extra field.", conn.host
                )

    def url_for(self, endpoint: str | None) -> str:
        if (
            self.base_url
            and not self.base_url.endswith("/")
            and endpoint
            and not endpoint.startswith("/")
            and not endpoint.startswith("http")
        ):
            return f"{self.base_url}/{endpoint}"
        if endpoint and endpoint.startswith("http"):
            return endpoint
        return (self.base_url or "") + (endpoint or "")

    def run(
        self,
        endpoint: str | None,
        data: dict | str | bytes | None = None,
        headers: dict | None = None,
        extra_options: dict | None = None,
    ) -> HttpResponse:
        """Perform one request. ``data`` goes to the query string for GET,
        nowhere for HEAD, and the body otherwise; dict bodies are
        form-encoded, matching requests' ``data=`` semantics the
        reference relies on (hooks/http.py:114-126)."""
        extra_options = extra_options or {}
        url = self.url_for(endpoint)
        merged = dict(self._default_headers)
        if headers:
            merged.update(headers)

        body: bytes | None = None
        if self.method == "GET":
            if data:
                params = (
                    urllib.parse.urlencode(data, doseq=True)
                    if isinstance(data, dict)
                    else str(data)
                )
                sep = "&" if "?" in url else "?"
                url = f"{url}{sep}{params}"
        elif self.method != "HEAD" and data is not None:
            if isinstance(data, dict):
                body = urllib.parse.urlencode(data, doseq=True).encode()
                merged.setdefault(
                    "Content-Type", "application/x-www-form-urlencoded"
                )
            elif isinstance(data, str):
                body = data.encode()
            else:
                body = data

        log.info("Sending '%s' to url: %s", self.method, url)
        resp = self._transport(
            self.method, url, body, merged, extra_options.get("timeout", 30.0)
        )
        if extra_options.get("check_response", True):
            self.check_response(resp)
        return resp

    def check_response(self, response: HttpResponse) -> None:
        """Raise on non-2xx/3xx, '<status>:<reason>' message shape as the
        reference (hooks/http.py:139-145); non-429 4xx raise the
        fail-fast HttpClientError subtype the retry layer honors."""
        if response.ok:
            return
        msg = f"{response.status}:{response.reason}"
        log.error("HTTP error: %s", response.reason)
        if _classify(response.status) == "fatal":
            raise HttpClientError(msg)
        raise IOError(msg)

    def run_with_advanced_retry(
        self,
        _retry_args: RetryArgs | dict | None = None,
        *args,
        **kwargs,
    ) -> HttpResponse:
        """Reference hooks/http.py:193-217 parity: run() under a bounded
        exponential-backoff retry. Classification is shared with
        sinks._post_with_retry — connection errors, 5xx and 429 retry;
        other 4xx (HttpClientError) fail fast on attempt 1."""
        ra = _retry_args or RetryArgs()
        if isinstance(ra, dict):
            ra = RetryArgs(**ra)
        attempt = 0
        while True:
            attempt += 1
            try:
                return self.run(*args, **kwargs)
            except HttpClientError as exc:
                # Fail-fast class — retried only if the caller opted the
                # specific status in via retry_statuses.
                status = _status_of(exc)
                if (
                    status not in ra.retry_statuses
                    or attempt >= ra.max_attempts
                ):
                    raise
                log.warning("%s — retrying (attempt %d)", exc, attempt)
                time.sleep(ra.backoff_base_s * (2 ** (attempt - 1)))
            except Exception as exc:
                # Connection errors and retryable statuses (5xx, 429).
                if attempt >= ra.max_attempts:
                    raise
                log.warning("%s — retrying (attempt %d)", exc, attempt)
                time.sleep(ra.backoff_base_s * (2 ** (attempt - 1)))


def _status_of(exc: Exception) -> int | None:
    """Best-effort status extraction from the '<status>:<reason>' shape."""
    head = str(exc).split(":", 1)[0]
    return int(head) if head.isdigit() else None
