"""Sink semantics (SURVEY.md §2.B): batching, retry, idempotence, metrics.

The REST sink runs inside foreachPartition on executor Python workers
(separate processes even in local mode), so the test stub is a real local
HTTP server owned by the driver — exactly the seam production crosses.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from martech_pipelines_spark.operators.sinks import (
    RestSinkConfig,
    chunkify,
    chunkify_by_bytes,
    rest_batch_sink,
    rest_csv_batch_sink,
    write_file,
)


class _Recorder(BaseHTTPRequestHandler):
    store: list[dict] = []
    fail_first_n = 0
    fail_status = 503
    attempts = 0

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        cls = type(self)
        cls.attempts += 1
        if cls.fail_first_n > 0:
            cls.fail_first_n -= 1
            self.send_response(cls.fail_status)
            self.end_headers()
            return
        try:
            payload = json.loads(body)
        except ValueError:  # CSV sink bodies are not JSON
            payload = None
        cls.store.append(
            {
                "payload": payload,
                "size": len(body),
                "lines": body.count(b"\n"),
                "auth": self.headers.get("Authorization"),
            }
        )
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def http_server():
    _Recorder.store = []
    _Recorder.fail_first_n = 0
    _Recorder.fail_status = 503
    _Recorder.attempts = 0
    srv = HTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/upload", _Recorder
    srv.shutdown()


def test_chunkify_contract():
    assert list(chunkify(list(range(7)), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    with pytest.raises(ValueError):
        list(chunkify([1], 0))


def test_chunkify_by_bytes_caps_batches():
    recs = ["x" * 10] * 10  # 11 bytes each incl newline
    batches = list(chunkify_by_bytes(recs, 30))
    assert all(sum(len(r) + 1 for r in b) <= 30 for b in batches)
    assert sum(len(b) for b in batches) == 10


def test_netcore_csv_cap_with_multi_mb_rows(spark, http_server):
    """B5 Netcore ≤4.5 MB cap pinned against multi-MB payloads (VERDICT
    r01 #6, reference hooks/netcore.py:103-119): 10 rows of ~1 MB must
    split so no POST body exceeds the cap (+ header line slack)."""
    url, rec = http_server
    cap = 4_500_000
    df = spark.createDataFrame(
        [(i, "x" * 1_000_000) for i in range(10)], "id long, blob string"
    ).coalesce(1)
    metrics = rest_csv_batch_sink(df, RestSinkConfig(url=url), max_bytes=cap)
    assert metrics["sent"] == 10
    assert metrics["batches"] >= 3  # 10 MB of rows cannot fit in 2 batches
    header_slack = len("id,blob") + 2
    assert all(r["size"] <= cap + header_slack for r in rec.store)


def test_probe_uniform_chunks_matches_reference_divisor_search():
    """Parity mode reproduces hooks/netcore.py:103-119: bump divisor i
    until the FIRST len/i-record chunk fits, then uniform len/i chunks."""
    from martech_pipelines_spark.operators.sinks import probe_uniform_chunks

    recs = ["x" * 9] * 12  # 10 bytes each incl newline, 120 total
    # cap 50 -> i=1 (120) fails, i=2 (first 6 recs = 60) fails, i=3 (40) fits
    chunks = list(probe_uniform_chunks(recs, 50))
    assert [len(c) for c in chunks] == [4, 4, 4]
    # everything fits in one chunk when under the cap
    assert [len(c) for c in list(probe_uniform_chunks(recs, 200))] == [12]
    assert list(probe_uniform_chunks([], 50)) == []
    # a single over-cap record terminates at 1-record chunks (reference
    # would loop toward a zero divisor; we stop at 1 and let it exceed)
    big = ["y" * 100]
    assert [len(c) for c in probe_uniform_chunks(big, 10)] == [1]


def test_netcore_probe_strategy_ships_uniform_chunks(spark, http_server):
    """chunk_strategy='probe' wires the reference's batch boundaries into
    the partition-parallel sink: uniform record counts per POST."""
    url, rec = http_server
    df = spark.createDataFrame(
        [(i, "x" * 100) for i in range(20)], "id long, blob string"
    ).coalesce(1)
    metrics = rest_csv_batch_sink(
        df, RestSinkConfig(url=url), max_bytes=500, chunk_strategy="probe"
    )
    assert metrics["sent"] == 20
    counts = [r["lines"] - 1 for r in rec.store]  # minus header line
    assert sum(counts) == 20
    assert len(set(counts[:-1])) <= 1  # all full chunks uniform
    with pytest.raises(ValueError):
        rest_csv_batch_sink(df, RestSinkConfig(url=url), chunk_strategy="nope")


def test_rest_sink_batches_and_metrics(spark, http_server):
    url, rec = http_server
    df = spark.createDataFrame(
        [(str(i) if i % 10 else None, f"u{i}") for i in range(95)],
        "identity string, name string",
    )
    cfg = RestSinkConfig(url=url, payload_size=25)
    metrics = rest_batch_sink(df.coalesce(2), cfg)
    assert metrics["processed"] == 95
    assert metrics["invalid"] == 10  # identity None rows rejected (E4/C8)
    assert metrics["sent"] == 85
    sizes = [len(r["payload"]["d"]) for r in rec.store]
    assert sum(sizes) == 85
    assert max(sizes) <= 25  # ≤payload_size per POST (B4 contract)
    # idempotency keys present and unique per batch
    ids = [r["payload"]["batch_id"] for r in rec.store]
    assert len(ids) == len(set(ids))


def test_rest_sink_idempotency_across_rerun(spark, http_server):
    """Same plan re-sent (Spark task retry analog) -> identical batch_ids,
    so a dedup-on-batch_id receiver achieves effectively-once."""
    url, rec = http_server
    df = spark.createDataFrame(
        [(str(i),) for i in range(40)], "identity string"
    ).coalesce(1)
    cfg = RestSinkConfig(url=url, payload_size=10)
    rest_batch_sink(df, cfg)
    first = sorted(r["payload"]["batch_id"] for r in rec.store)
    rec.store.clear()
    rest_batch_sink(df, cfg)
    second = sorted(r["payload"]["batch_id"] for r in rec.store)
    assert first == second


def test_rest_sink_retries_on_5xx(spark, http_server):
    url, rec = http_server
    rec.fail_first_n = 2  # first two attempts 503, third succeeds
    df = spark.createDataFrame([("1",)], "identity string").coalesce(1)
    cfg = RestSinkConfig(url=url, payload_size=10, backoff_base_s=0.01)
    metrics = rest_batch_sink(df, cfg)
    assert metrics["sent"] == 1 and len(rec.store) == 1


def test_rest_sink_retries_on_429(spark, http_server):
    url, rec = http_server
    rec.fail_first_n, rec.fail_status = 2, 429  # rate-limited twice, then ok
    df = spark.createDataFrame([("1",)], "identity string").coalesce(1)
    cfg = RestSinkConfig(url=url, payload_size=10, backoff_base_s=0.01)
    metrics = rest_batch_sink(df, cfg)
    assert metrics["sent"] == 1 and rec.attempts == 3


def test_rest_sink_fails_fast_on_4xx(spark, http_server):
    """Permanent client errors must NOT burn max_attempts with backoff
    (ADVICE r01): exactly one POST, then raise."""
    url, rec = http_server
    rec.fail_first_n, rec.fail_status = 99, 400  # always 400
    df = spark.createDataFrame([("1",)], "identity string").coalesce(1)
    cfg = RestSinkConfig(url=url, payload_size=10, backoff_base_s=0.01)
    with pytest.raises(Exception, match="HTTP 400"):
        rest_batch_sink(df, cfg)
    assert rec.attempts == 1


def test_rest_sink_jwt_signing(spark, http_server):
    url, rec = http_server
    df = spark.createDataFrame([("1",)], "identity string").coalesce(1)
    cfg = RestSinkConfig(url=url, payload_size=10, jwt_secret="s3cret")
    rest_batch_sink(df, cfg)
    auth = rec.store[0]["auth"]
    assert auth and auth.startswith("Bearer ") and auth.count(".") == 2


def test_compact_files_reduces_file_count(spark, tmp_path):
    from martech_pipelines_spark.operators.sinks import compact_files

    src = str(tmp_path / "fragmented")
    df = spark.range(0, 20_000).selectExpr("id", "repeat('x', 64) AS pad")
    df.repartition(40).write.parquet(src)  # 40 small files
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 40
    dest = str(tmp_path / "compacted")
    n = compact_files(spark, src, dest, target_mb=128)
    assert n == 1  # tiny table fits one target file
    assert len(glob.glob(f"{dest}/part-*")) == 1
    assert spark.read.parquet(dest).count() == 20_000


def test_file_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    path = str(tmp_path / "out_parquet")
    write_file(df, path, fmt="parquet", mode="overwrite")
    assert spark.read.parquet(path).count() == 2
    csv_path = str(tmp_path / "out_csv")
    write_file(df, csv_path, fmt="csv", single_file=True, compression="gzip")
    back = spark.read.option("header", "true").csv(csv_path)
    assert back.count() == 2


def test_pipe5_export_end_to_end(spark, http_server):
    """pipe5: flagship CDC compaction -> profile export transform ->
    rest_batch_sink against a live local HTTP stub, in one run. The
    POSTed record count must equal the oracle-checked query's row count
    (ties B4 to the relational surface; the reference's EP2 path as one
    pipeline — reference: tasks/user_profile/clevertap.py:30-61)."""
    from martech_pipelines_spark.plans import QUERIES

    url, rec = http_server
    df = QUERIES["pipe5_export_e2e"](spark, "/root/testdata/sf0.001")
    expected = df.count()
    assert expected > 0

    cfg = RestSinkConfig(url=url, payload_size=100)
    metrics = rest_batch_sink(df, cfg)
    # every compacted profile row has a truthy identity (the query already
    # rejected null/0 identities), so processed == sent == query rows
    assert metrics["processed"] == expected
    assert metrics["invalid"] == 0
    assert metrics["sent"] == expected
    shipped = [len(r["payload"]["d"]) for r in rec.store]
    assert sum(shipped) == expected
    assert max(shipped) <= 100
    assert metrics["batches"] == len(rec.store)
    # idempotency keys unique per batch
    ids = [r["payload"]["batch_id"] for r in rec.store]
    assert len(ids) == len(set(ids))
