"""Generic HTTP hook (operators/http.py): Connection-driven URL/auth/
headers, arbitrary methods, response checking, and the shared
retry classification — against a real local stub server, no Spark.

Mirrors the reference surface at martech_pipelines/hooks/http.py:24-217.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from martech_pipelines_spark.operators.connections import ConnectionRegistry
from martech_pipelines_spark.operators.http import HttpHook, RetryArgs
from martech_pipelines_spark.operators.sinks import HttpClientError


class _Echo(BaseHTTPRequestHandler):
    requests: list[dict] = []
    fail_first_n = 0
    fail_status = 503

    def _handle(self):
        cls = type(self)
        length = int(self.headers.get("Content-Length") or 0)
        cls.requests.append(
            {
                "method": self.command,
                "path": self.path,
                "headers": dict(self.headers),
                "body": self.rfile.read(length) if length else b"",
            }
        )
        if cls.fail_first_n > 0:
            cls.fail_first_n -= 1
            self.send_response(cls.fail_status)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(json.dumps({"ok": True}).encode())

    do_GET = do_POST = do_PUT = do_DELETE = do_HEAD = do_PATCH = _handle

    def log_message(self, *args):
        pass


@pytest.fixture()
def server():
    _Echo.requests = []
    _Echo.fail_first_n = 0
    _Echo.fail_status = 503
    srv = HTTPServer(("127.0.0.1", 0), _Echo)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_port, _Echo
    srv.shutdown()


def registry_for(srv_port: int, **overrides) -> ConnectionRegistry:
    conn = {
        "host": "127.0.0.1",
        "schema": "http",
        "port": srv_port,
        "login": "svc",
        "password": "pw",
        "extra": json.dumps({"X-Tenant": "acme"}),
    }
    conn.update(overrides)
    return ConnectionRegistry({"api": conn})


def test_get_sends_params_auth_and_extra_headers(server):
    port, rec = server
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    resp = hook.run("v1/items", data={"q": "a b", "n": 2})
    assert resp.ok and resp.json() == {"ok": True}
    req = rec.requests[0]
    assert req["method"] == "GET"
    assert req["path"] == "/v1/items?q=a+b&n=2"
    assert req["body"] == b""  # GET: params, never a body
    expected = "Basic " + base64.b64encode(b"svc:pw").decode()
    assert req["headers"]["Authorization"] == expected
    assert req["headers"]["X-Tenant"] == "acme"  # Connection extras


def test_head_sends_no_params_and_post_formencodes_dict(server):
    port, rec = server
    head = HttpHook(registry_for(port), method="HEAD", http_conn_id="api")
    head.run("ping", data={"ignored": "1"})
    assert rec.requests[0]["path"] == "/ping" and rec.requests[0]["body"] == b""

    post = HttpHook(registry_for(port), method="POST", http_conn_id="api")
    post.run("submit", data={"a": "1", "b": "2"})
    req = rec.requests[1]
    assert req["body"] == b"a=1&b=2"
    assert req["headers"]["Content-Type"] == "application/x-www-form-urlencoded"


def test_url_building_rules(server):
    port, _ = server
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    assert hook.base_url == f"http://127.0.0.1:{port}"
    assert hook.url_for("v1/x") == f"http://127.0.0.1:{port}/v1/x"
    assert hook.url_for("/v1/x") == f"http://127.0.0.1:{port}/v1/x"
    assert hook.url_for("http://other/abs") == "http://other/abs"
    # host already carrying a scheme wins verbatim (hooks/http.py:51-53)
    absolute = HttpHook(
        registry_for(
            port, host=f"http://127.0.0.1:{port}/base", schema=None, port=None
        ),
        method="GET",
        http_conn_id="api",
    )
    assert absolute.base_url == f"http://127.0.0.1:{port}/base"


def test_invalid_extra_is_ignored(server):
    port, rec = server
    hook = HttpHook(
        registry_for(port, extra="not json"), method="GET", http_conn_id="api"
    )
    hook.run("ok")
    assert "X-Tenant" not in rec.requests[0]["headers"]


def test_non_2xx_raises_status_reason_and_check_response_off(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 2, 404
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    with pytest.raises(HttpClientError, match="404:"):
        hook.run("missing")
    resp = hook.run("missing", extra_options={"check_response": False})
    assert resp.status == 404  # unchecked: response returned, not raised


def test_retry_5xx_then_success(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 2, 503
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    resp = hook.run_with_advanced_retry(
        RetryArgs(max_attempts=3, backoff_base_s=0.01), "flaky"
    )
    assert resp.ok and len(rec.requests) == 3


def test_retry_429_then_success(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 1, 429
    hook = HttpHook(registry_for(port), method="POST", http_conn_id="api")
    resp = hook.run_with_advanced_retry(
        RetryArgs(max_attempts=3, backoff_base_s=0.01), "rate-limited", data="x"
    )
    assert resp.ok and len(rec.requests) == 2


def test_4xx_fails_fast_without_retry(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 5, 400
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    with pytest.raises(HttpClientError):
        hook.run_with_advanced_retry(
            RetryArgs(max_attempts=4, backoff_base_s=0.01), "bad"
        )
    assert len(rec.requests) == 1  # exactly one attempt: fail-fast class


def test_4xx_opt_in_retry_statuses(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 1, 404
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    resp = hook.run_with_advanced_retry(
        RetryArgs(max_attempts=3, backoff_base_s=0.01, retry_statuses=frozenset({404})),
        "eventually-there",
    )
    assert resp.ok and len(rec.requests) == 2


def test_exhausted_retries_raise(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 9, 500
    hook = HttpHook(registry_for(port), method="GET", http_conn_id="api")
    with pytest.raises(IOError, match="500:"):
        hook.run_with_advanced_retry(
            {"max_attempts": 2, "backoff_base_s": 0.01}, "down"
        )
    assert len(rec.requests) == 2


def test_connection_error_retries(server):
    port, rec = server
    # point at a closed port: pure connection errors, no HTTP status
    registry = registry_for(1)  # port 1: nothing listens
    hook = HttpHook(registry, method="GET", http_conn_id="api")
    with pytest.raises(OSError):
        hook.run_with_advanced_retry(
            RetryArgs(max_attempts=2, backoff_base_s=0.01), "unreachable"
        )
