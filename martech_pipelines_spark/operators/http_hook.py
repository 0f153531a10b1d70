"""Generic HTTP hook (SURVEY.md §2.B; reference:
martech_pipelines/hooks/http.py:24-139 ``HttpHook.get_conn/run``,
:140-217 ``check_response/run_and_check/run_with_advanced_retry``).

The batch sinks (operators/sinks.py) cover the POST-push data path; this
hook covers everything else a reference job does over HTTP — GET probes
before a push, HEAD existence checks, DELETE cleanup calls — with the
same Connection-driven base-url/auth/header resolution the reference
builds in ``get_conn`` (hooks/http.py:41-74):

- ``host`` containing ``://`` is taken as the base URL verbatim; else
  ``schema`` (default ``http``) + ``://`` + host, with ``port`` appended.
- ``login``/``password`` become basic auth.
- ``extra`` JSON becomes default headers (invalid extra -> warning, no
  headers — reference hooks/http.py:65-70).

Driver-side control plane only: the hook never ships to executors (the
partition-parallel path is ``rest_batch_sink``). Transport is injected
(``TransportFn``) so tests run against a real local HTTP server and
production uses stdlib urllib — same seam as the sinks' ``PostFn``.

``run_with_advanced_retry`` mirrors the reference's tenacity wrapper
(hooks/http.py:193-217) but reuses the engine's retry classification
(sinks._post_with_retry): connection errors, 429 and 5xx back off and
retry; other 4xx fail fast as ``HttpClientError``.
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
from dataclasses import dataclass

from martech_pipelines_spark.operators.connections import Connection, ConnectionRegistry
from martech_pipelines_spark.operators.sinks import HttpClientError

log = logging.getLogger(__name__)

# (method, url, body, headers) -> (status, response_body)
TransportFn = Callable[[str, str, bytes | None, dict], tuple[int, bytes]]


def default_transport(
    method: str, url: str, body: bytes | None, headers: dict
) -> tuple[int, bytes]:
    """Production transport: stdlib urllib (requests-free, same choice as
    sinks.default_post). HTTPError is returned as a status, not raised,
    so the caller's 4xx/5xx classification stays authoritative."""
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@dataclass
class HttpResponse:
    """Minimal response surface the reference call-sites use
    (``.status_code`` / ``.text`` / ``.json()``)."""

    status_code: int
    body: bytes = b""

    @property
    def text(self) -> str:
        return self.body.decode("utf-8", errors="replace")

    def json(self):
        return json.loads(self.body)


class HttpHook:
    """Arbitrary-method HTTP runner over a Connection.

    ``conn`` may be a Connection, a conn_id resolved through ``registry``,
    or None (absolute-URL endpoints only).
    """

    def __init__(
        self,
        method: str = "POST",
        conn: Connection | str | None = None,
        registry: ConnectionRegistry | None = None,
        transport: TransportFn = default_transport,
    ) -> None:
        self.method = method.upper()
        if isinstance(conn, str):
            if registry is None:
                raise ValueError("conn_id given without a registry")
            conn = registry.get(conn)
        self.connection = conn
        self.transport = transport
        self.base_url = self._base_url(conn) if conn else ""

    @staticmethod
    def _base_url(conn: Connection) -> str:
        # reference hooks/http.py:52-61
        if conn.host and "://" in conn.host:
            base = conn.host
        else:
            base = (conn.schema or "http") + "://" + (conn.host or "")
        if conn.port:
            base = f"{base}:{conn.port}"
        return base

    def _headers(self, headers: dict | None) -> dict:
        out: dict = {}
        conn = self.connection
        if conn is not None:
            if conn.extra:
                extras = conn.extra_dejson
                if not extras:
                    log.warning(
                        "Connection to %s has invalid extra field.", conn.host
                    )
                out.update(extras)
            if conn.login:
                token = base64.b64encode(
                    f"{conn.login}:{conn.password or ''}".encode()
                ).decode()
                out["Authorization"] = f"Basic {token}"
        if headers:
            out.update(headers)
        return out

    def url_for(self, endpoint: str | None) -> str:
        # reference hooks/http.py:104-113
        if endpoint and endpoint.startswith("http"):
            return endpoint
        if (
            self.base_url
            and not self.base_url.endswith("/")
            and endpoint
            and not endpoint.startswith("/")
        ):
            return self.base_url + "/" + endpoint
        return (self.base_url or "") + (endpoint or "")

    def run(
        self,
        endpoint: str | None,
        data: dict | str | bytes | None = None,
        headers: dict | None = None,
        extra_options: dict | None = None,
    ) -> HttpResponse:
        """Perform the request. GET sends ``data`` as query params; HEAD
        sends none; other methods send it as the body (reference
        hooks/http.py:115-131). ``extra_options={'check_response': False}``
        skips raising on non-2xx/3xx (reference :96-99)."""
        extra_options = extra_options or {}
        url = self.url_for(endpoint)
        hdrs = self._headers(headers)
        body: bytes | None = None
        if self.method == "GET":
            if data:
                qs = data if isinstance(data, str) else urllib.parse.urlencode(data)
                url = url + ("&" if "?" in url else "?") + qs
        elif self.method != "HEAD" and data is not None:
            if isinstance(data, bytes):
                body = data
            elif isinstance(data, str):
                body = data.encode()
            else:
                body = urllib.parse.urlencode(data).encode()
                hdrs.setdefault("Content-Type", "application/x-www-form-urlencoded")
        status, rbody = self.transport(self.method, url, body, hdrs)
        resp = HttpResponse(status, rbody)
        if extra_options.get("check_response", True):
            self.check_response(resp)
        return resp

    def check_response(self, response: HttpResponse) -> None:
        """Raise on non-2xx/3xx (reference hooks/http.py:133-145 raises
        ``Exception(status:reason)``); the engine splits permanent client
        errors out as HttpClientError so retry wrappers can classify."""
        status = response.status_code
        if status < 400:
            return
        if status != 429 and 400 <= status < 500:
            raise HttpClientError(f"HTTP {status}: {response.text[:200]}")
        raise OSError(f"HTTP {status}: {response.text[:200]}")

    def run_with_advanced_retry(
        self,
        _retry_args: dict | None = None,
        *args,
        **kwargs,
    ) -> HttpResponse:
        """Reference hooks/http.py:193-217 wraps ``run`` in tenacity with
        caller-supplied args; here the same knobs (``max_attempts``,
        ``backoff_base_s``) drive the engine's standard classification:
        connection errors / 429 / 5xx retry with exponential backoff,
        other 4xx (HttpClientError) fail fast."""
        _retry_args = _retry_args or {}
        max_attempts = int(_retry_args.get("max_attempts", 3))
        backoff = float(_retry_args.get("backoff_base_s", 0.5))
        attempt = 0
        while True:
            attempt += 1
            try:
                return self.run(*args, **kwargs)
            except HttpClientError:
                raise
            except Exception:
                if attempt >= max_attempts:
                    raise
                time.sleep(backoff * (2 ** (attempt - 1)))
