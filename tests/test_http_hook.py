"""Generic HTTP hook parity (reference hooks/http.py): URL/auth/header
resolution from Connections, arbitrary methods against a real local
server, response checking, and retry classification."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from martech_pipelines_spark.operators.connections import Connection, ConnectionRegistry
from martech_pipelines_spark.operators.http_hook import HttpHook, HttpResponse
from martech_pipelines_spark.operators.sinks import HttpClientError


class _AnyMethod(BaseHTTPRequestHandler):
    calls: list[dict] = []
    fail_first_n = 0
    fail_status = 503

    def _handle(self):
        cls = type(self)
        length = int(self.headers.get("Content-Length") or 0)
        cls.calls.append(
            {
                "method": self.command,
                "path": self.path,
                "body": self.rfile.read(length) if length else b"",
                "auth": self.headers.get("Authorization"),
                "passcode": self.headers.get("X-Passcode"),
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
            self.wfile.write(json.dumps({"ok": True, "path": self.path}).encode())

    do_GET = do_POST = do_PUT = do_DELETE = do_HEAD = do_PATCH = _handle

    def log_message(self, *args):
        pass


@pytest.fixture()
def server():
    _AnyMethod.calls = []
    _AnyMethod.fail_first_n = 0
    _AnyMethod.fail_status = 503
    srv = HTTPServer(("127.0.0.1", 0), _AnyMethod)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_port, _AnyMethod
    srv.shutdown()


def _conn(port, **kw):
    return Connection("api", host="127.0.0.1", schema="http", port=port, **kw)


def test_base_url_resolution_rules():
    # host with scheme taken verbatim; else schema defaults to http; port appended
    assert HttpHook._base_url(Connection("a", host="https://x.io")) == "https://x.io"
    assert HttpHook._base_url(Connection("a", host="x.io")) == "http://x.io"
    assert (
        HttpHook._base_url(Connection("a", host="x.io", schema="https", port=8443))
        == "https://x.io:8443"
    )


def test_url_join_rules(server):
    port, _ = server
    hook = HttpHook("GET", _conn(port))
    assert hook.url_for("v1/probe") == f"http://127.0.0.1:{port}/v1/probe"
    assert hook.url_for("/v1/probe") == f"http://127.0.0.1:{port}/v1/probe"
    assert hook.url_for("http://other/abs") == "http://other/abs"
    assert HttpHook("GET").url_for("http://other/abs") == "http://other/abs"


def test_get_sends_query_params_and_auth_headers(server):
    port, rec = server
    conn = _conn(port, login="acct", password="pw", extra='{"X-Passcode": "p"}')
    resp = HttpHook("GET", conn).run("v1/status", data={"q": "a b", "n": 2})
    assert resp.status_code == 200 and resp.json()["ok"] is True
    call = rec.calls[-1]
    assert call["method"] == "GET"
    assert call["path"] == "/v1/status?q=a+b&n=2"
    assert call["body"] == b""  # GET carries no body
    assert call["auth"].startswith("Basic ")
    assert call["passcode"] == "p"  # extras become default headers


def test_registry_resolves_conn_id_with_secret(server, monkeypatch):
    port, rec = server
    monkeypatch.setenv("MARTECH_API_KEY", "sekret")
    reg = ConnectionRegistry(
        {
            "api": {
                "host": "127.0.0.1",
                "port": port,
                "login": "acct",
                "password_secret": "martech/api-key",
            }
        }
    )
    HttpHook("GET", "api", registry=reg).run("ping")
    import base64

    assert rec.calls[-1]["auth"] == "Basic " + base64.b64encode(
        b"acct:sekret"
    ).decode()


def test_head_sends_no_body_delete_and_put_send_body(server):
    port, rec = server
    assert HttpHook("HEAD", _conn(port)).run("obj", data={"x": 1}).status_code == 200
    assert rec.calls[-1]["method"] == "HEAD" and rec.calls[-1]["body"] == b""
    HttpHook("PUT", _conn(port)).run("obj", data='{"a":1}')
    assert rec.calls[-1]["method"] == "PUT" and rec.calls[-1]["body"] == b'{"a":1}'
    HttpHook("DELETE", _conn(port)).run("obj")
    assert rec.calls[-1]["method"] == "DELETE"


def test_post_form_encodes_dict_body(server):
    port, rec = server
    HttpHook("POST", _conn(port)).run("form", data={"a": 1, "b": "x y"})
    assert rec.calls[-1]["body"] == b"a=1&b=x+y"


def test_check_response_raises_and_can_be_disabled(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 1, 404
    with pytest.raises(HttpClientError):
        HttpHook("GET", _conn(port)).run("missing")
    rec.fail_first_n, rec.fail_status = 1, 404
    resp = HttpHook("GET", _conn(port)).run(
        "missing", extra_options={"check_response": False}
    )
    assert resp.status_code == 404


def test_advanced_retry_recovers_from_5xx_and_429(server):
    port, rec = server
    for status in (503, 429):
        rec.fail_first_n, rec.fail_status = 2, status
        resp = HttpHook("GET", _conn(port)).run_with_advanced_retry(
            {"max_attempts": 3, "backoff_base_s": 0.01}, "flaky"
        )
        assert resp.status_code == 200


def test_advanced_retry_fails_fast_on_permanent_4xx(server):
    port, rec = server
    rec.fail_first_n, rec.fail_status = 5, 400
    with pytest.raises(HttpClientError):
        HttpHook("GET", _conn(port)).run_with_advanced_retry(
            {"max_attempts": 5, "backoff_base_s": 0.01}, "bad"
        )
    # exactly one attempt: permanent client errors never burn the budget
    assert rec.fail_first_n == 4


def test_advanced_retry_exhausts_on_connection_error():
    hook = HttpHook("GET", Connection("a", host="127.0.0.1", port=1))
    with pytest.raises(Exception):
        hook.run_with_advanced_retry({"max_attempts": 2, "backoff_base_s": 0.01}, "x")


def test_response_text_and_json_surface():
    r = HttpResponse(200, b'{"a": 1}')
    assert r.json() == {"a": 1} and r.text == '{"a": 1}'
