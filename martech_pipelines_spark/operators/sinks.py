"""Sinks (SURVEY.md §2.B): file sinks + partition-parallel batched REST sinks.

The reference exports in a single driver process: pandas chunks -> dict
records -> ≤1000-record JSON payloads -> requests POST with tenacity retry
(reference: martech_pipelines/operators/clevertap_user_profile.py:61-79,
hooks/clevertap.py:27-38, hooks/http.py:193-217). That caps throughput at
one CPU and one NIC.

Spark-first re-expression: the batching/POST loop runs inside
``foreachPartition`` so every executor ships its own partitions in
parallel. Design points for scale and safety:

- **Batch shape**: in-partition ``chunkify(payload_size)`` (F11) rebuilt
  from the documented contract (≤1000 records/POST, ``{"d": [...]}``).
- **Retry**: exponential backoff, 3 attempts, retry on connection errors —
  the reference's tenacity policy re-expressed with stdlib.
- **Idempotence** (SURVEY.md §7.4.4): Spark task retries re-send whole
  partitions, so every batch carries a deterministic ``batch_id`` derived
  from (partition id, chunk index, first/last record identity). A receiver
  that dedupes on ``batch_id`` gets effectively-once; the stub-server test
  pins this.
- **Metrics** (E4): processed/sent/invalid counters via Spark accumulators
  (the reference's module-level counters don't survive distribution).
- **Transport injection**: the HTTP POST callable is a constructor arg so
  tests inject a recorder and production injects urllib/requests; the
  callable must be picklable (top-level function / functools.partial).
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Generator, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PostFn = Callable[[str, bytes, dict], int]  # (url, body, headers) -> status


def chunkify(items: list, chunk_size: int) -> Generator[list, None, None]:
    """F11: successive fixed-size chunks (reference:
    martech_pipelines/utils/helpers.py:4-9; ValueError on size<=0 kept)."""
    if chunk_size <= 0:
        raise ValueError("Chunk size must be a positive integer")
    for i in range(0, len(items), chunk_size):
        yield items[i : i + chunk_size]


def chunkify_by_bytes(
    records: Iterable[str], max_bytes: int
) -> Generator[list[str], None, None]:
    """B5: size-capped batching (Netcore's 4.5 MB CSV cap — reference:
    martech_pipelines/hooks/netcore.py:103-119 probes by halving; we size
    directly from encoded record lengths, one pass, no probe)."""
    batch: list[str] = []
    size = 0
    for rec in records:
        rec_len = len(rec.encode("utf-8")) + 1
        if batch and size + rec_len > max_bytes:
            yield batch
            batch, size = [], 0
        batch.append(rec)
        size += rec_len
    if batch:
        yield batch


def probe_uniform_chunks(
    records: list[str], max_bytes: int
) -> Generator[list[str], None, None]:
    """B5 parity mode: the reference's adaptive size probe (reference:
    martech_pipelines/hooks/netcore.py:103-119) rendered on encoded lines.

    Behavior reproduced exactly: start with the whole partition as one
    chunk; while the FIRST chunk's rendered size exceeds the cap, bump the
    divisor ``i`` and re-probe the first ``len/i`` records; then emit the
    whole set in uniform ``len/i``-record chunks. Only the first chunk is
    probed, so a later chunk with wider rows can still exceed the cap —
    that is the reference's behavior, kept for parity. The default
    ``chunkify_by_bytes`` path has no such hole (it measures every chunk)
    and is what production should use; this mode exists so a reference
    job ported verbatim sees identical batch boundaries."""
    size = len(records)
    if size == 0:
        return

    def rendered_bytes(chunk: list[str]) -> int:
        return sum(len(r.encode("utf-8")) + 1 for r in chunk)

    i = 1
    chunk = records
    while rendered_bytes(chunk) > max_bytes and size // i > 1:
        i += 1
        chunk = records[: size // i]
    yield from chunkify(records, max(1, size // i))


# --- file sinks (B1-B3) ------------------------------------------------------


def write_file(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    single_file: bool = False,
    header: bool = True,
) -> None:
    """B1/B2/B3: format-parameterized file sink (reference:
    martech_pipelines/tasks/sample/entrypoint.py:16-18; CSV-to-S3 at
    hooks/aws_s3.py:387-396; gzip at :236-249).

    ``partition_by`` is the 100-TB lever: partition output by the pruning
    key (e.g. event_date) so downstream incremental scans skip files.
    ``single_file`` coalesces to one output object — only for API-style
    destinations that require a single CSV; never for big data.
    """
    out = df.coalesce(1) if single_file else df
    writer = out.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", str(header).lower())
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog-table sink — the co-located-join lever: two tables
    bucketed on the same key and bucket count sort-merge join with ZERO
    exchanges (pinned by tests/test_plans.py::test_bucketed_join_is_
    exchange_free). Bucket the standing fact tables on their join key when
    the same fact-fact join runs repeatedly; the shuffle is paid once at
    write, not on every query. ``sort_cols`` additionally sorts within
    buckets so merge joins skip the per-task sort.

    Overwrite mode drops the catalog entry AND purges the warehouse
    location first: a location directory orphaned by a discarded
    metastore (e.g. a prior session's Derby db) survives ``DROP TABLE IF
    EXISTS`` and makes ``saveAsTable`` refuse with
    LOCATION_ALREADY_EXISTS."""
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        parts = table.split(".")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        # resolve the DATABASE explicitly: an unqualified name lands in
        # the CURRENT database, whose managed location is
        # <warehouse>/<db>.db/<table> for any non-default db — assuming
        # default here would purge the default db's same-named table
        # directory (destroying unrelated data) and leave the real
        # orphan in place
        db = (
            parts[-2].lower()
            if len(parts) > 1
            else spark.catalog.currentDatabase().lower()
        )
        tbl = parts[-1].lower()
        rel = tbl if db == "default" else f"{db}.db/{tbl}"
        hpath = jvm.org.apache.hadoop.fs.Path(warehouse, rel)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    writer = df.write.format(fmt).mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _dir_bytes(spark, path: str) -> int:
    """Total byte size of a directory through the Hadoop FS API — works
    for any filesystem Spark can read (local, S3A, HDFS)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_files(
    spark,
    src_path: str,
    dest_path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Lakehouse maintenance: rewrite a directory of small files into
    ~``target_mb`` output files. Small-file proliferation is the classic
    incremental-sink pathology (every micro-batch writes a file per
    partition; a year later the table is a million 100 KB files and scan
    planning dominates query time). Returns the output file count.

    Returns the REQUESTED output file count (the repartition target) —
    the actual part-file count can differ when the table has fewer rows
    than targets or recompression changes sizes. Sizing uses the on-disk
    (compressed) directory size including metadata files — a deliberate
    approximation: the alternative (sampling decoded row sizes) costs a
    read of the data for marginal accuracy. Writes to ``dest_path``,
    never in place — the caller swaps paths/partitions atomically in its
    catalog, so a failed compaction never corrupts the live table."""
    import math

    total = _dir_bytes(spark, src_path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_path)
    df.repartition(n).write.mode("overwrite").format(fmt).save(dest_path)
    return n


def recover_dir_swap(path: str) -> None:
    """Crash recovery for ``compact_batch_dirs``'s two-rename swap:
    drop a stale ``.next`` (died mid-write — source dirs intact),
    restore ``.old`` when the live dir is missing (died between the two
    renames), drop ``.old`` when the live dir is present (died after
    the swap, before cleanup).  Invoked by every index reader so an
    interrupted compaction self-heals on the next probe."""
    import os
    import shutil

    nxt, old = path + ".next", path + ".old"
    if os.path.isdir(nxt):
        shutil.rmtree(nxt)
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    elif os.path.isdir(path) and os.path.isdir(old):
        shutil.rmtree(old)


def compact_batch_dirs(
    spark,
    root: str,
    batch_col: str = "batch_id",
    partition_by: tuple[str, ...] = (),
    merge=None,
) -> bool:
    """Fold the ``{batch_col}=N`` directories of a streamed/appended
    index root into a single ``{batch_col}=-1`` — the shared nightly
    compaction for every batch_id-keyed incremental index in this
    engine (BM25 postings/stats, MinHash signatures, the prep index;
    the IVF corpus_delta has its own base-merging variant in
    ``similarity.ivf_compact_index``).  Long-running streaming ingest
    writes one small file set per micro-batch; this rewrite keeps
    probe-side file counts bounded without changing any reader: every
    probe already scans the parent dir and treats the batch partition
    column as inert, and the folded content multiset is identical, so
    a crash between two roots of a multi-root index (e.g. postings
    swapped, stats not yet) still answers every query identically.

    ``merge`` optionally re-aggregates the unioned rows (e.g. the BM25
    stats table folds to one row of sums).  Returns False when the root
    holds at most one batch directory (nothing to fold).  Same
    offline-maintenance contract as ``ivf_compact_index``: run with the
    ingest stream paused."""
    import os
    import shutil

    recover_dir_swap(root)
    prefix = f"{batch_col}="
    batches = [d for d in os.listdir(root) if d.startswith(prefix)]
    if len(batches) <= 1:
        return False
    folded = spark.read.parquet(root).drop(batch_col)
    if merge is not None:
        folded = merge(folded)
    nxt, old = root + ".next", root + ".old"
    writer = folded.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{nxt}/{prefix}-1")
    # Record the time-travel horizon BEFORE the destructive swap: as-of
    # reads below the max folded batch id are now impossible (compaction
    # trades history depth for file counts — the VACUUM tradeoff).  A
    # crash between marker and swap errs CONSERVATIVE — the marker
    # refuses an as-of read the intact deltas could still serve — while
    # the old after-the-rmtree ordering could leave a compacted root
    # with a stale horizon silently answering a historical read with
    # folded-in later batches (ADVICE r8).  Sibling file, not inside the
    # root: the swap below replaces the root wholesale.
    folded_ids = [
        int(d[len(prefix):]) for d in batches if d[len(prefix):] != "-1"
    ]
    if folded_ids:
        _write_compaction_marker(root + ".compacted_through", max(folded_ids))
    os.rename(root, old)
    os.rename(nxt, root)
    shutil.rmtree(old)
    return True


def _write_compaction_marker(path: str, value: int) -> None:
    """Persist max(existing, value) — markers only ever advance."""
    prev = _read_compaction_marker(path)
    if prev is None or value > prev:
        with open(path, "w") as f:
            f.write(str(int(value)))


def _read_compaction_marker(path: str):
    import os

    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(f.read().strip())


def read_batched_index(spark, root: str, batch_col: str = "batch_id", as_of=None):
    """Read a batch_id-keyed incremental index root with optional AS-OF
    time travel: ``as_of=N`` reproduces the index as it stood after
    batch N landed (initial build/compacted rows carry ``-1`` and are
    always included).  Raises when compaction has folded batches beyond
    ``as_of`` — a silent partial answer would masquerade as the
    historical one.  Self-heals an interrupted compaction first, like
    every reader of these roots.

    This is the reproducible-training-run primitive: pin the batch id a
    run trained against, and its dedup/decontamination/probe decisions
    replay exactly until compaction passes that horizon."""
    from pyspark.sql import functions as F

    recover_dir_swap(root)
    df = spark.read.parquet(root)
    if as_of is None:
        return df
    horizon = _read_compaction_marker(root + ".compacted_through")
    if horizon is not None and horizon > int(as_of):
        raise ValueError(
            f"as_of={as_of} is below this index's compaction horizon "
            f"({horizon}): batches <= {horizon} were folded into the "
            f"base and can no longer be separated. Compaction trades "
            f"time-travel depth for probe-side file counts; retain "
            f"deltas longer if reproducibility past this point matters."
        )
    if batch_col not in df.columns:
        return df  # flat batch-built index: everything is the initial snapshot
    return df.where(
        (F.col(batch_col) == -1) | (F.col(batch_col) <= int(as_of))
    )


# --- REST batch sink (B4-B6) -------------------------------------------------


def default_post(url: str, body: bytes, headers: dict) -> int:
    """Production transport: stdlib urllib (requests-free, executor-safe)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            return resp.status
    except urllib.error.HTTPError as e:
        # Return the status instead of raising so the retry wrapper's
        # 4xx-fail-fast / 5xx-retry classification stays authoritative.
        return e.code


def _batch_id(partition_id: int, chunk_idx: int, records: list[dict], identity_key: str) -> str:
    """Deterministic idempotency key: stable across Spark task retries
    because partition contents and chunk order are deterministic for a
    deterministic input plan."""
    first = str(records[0].get(identity_key, "")) if records else ""
    last = str(records[-1].get(identity_key, "")) if records else ""
    raw = f"{partition_id}:{chunk_idx}:{len(records)}:{first}:{last}"
    return hashlib.sha256(raw.encode()).hexdigest()[:24]


@dataclass
class RestSinkConfig:
    url: str
    payload_size: int = 1000  # reference: operators/clevertap_user_profile.py:29
    identity_key: str = "identity"
    wrapper_key: str = "d"  # {"d": [...]} — reference: :78
    max_attempts: int = 3  # reference: hooks/clevertap.py:21-25
    backoff_base_s: float = 0.5
    headers: dict | None = None
    jwt_secret: str | None = None  # B6 Gamooga-style HS256 signing
    drop_null_values: bool = True  # reference drops None-valued attrs (:76)


def _jwt_hs256(payload: dict, secret: str) -> str:
    """B6: minimal HS256 JWT (stdlib hmac) for Gamooga-style signed batches
    (reference: martech_pipelines/hooks/gamooga.py:39-74)."""
    import base64
    import hmac

    def b64(obj: bytes) -> str:
        return base64.urlsafe_b64encode(obj).rstrip(b"=").decode()

    header = b64(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    body = b64(json.dumps(payload, separators=(",", ":")).encode())
    sig = hmac.new(secret.encode(), f"{header}.{body}".encode(), hashlib.sha256).digest()
    return f"{header}.{body}.{b64(sig)}"


class HttpClientError(IOError):
    """Non-retryable 4xx response (other than 429)."""


def _post_with_retry(post_fn: PostFn, cfg: RestSinkConfig, body: bytes, headers: dict) -> int:
    """Retry policy matching the reference's tenacity intent (hooks/
    clevertap.py:21-25 retries ConnectionError only): connection-level
    exceptions and transient statuses (5xx, 429) back off and retry;
    permanent 4xx client errors fail fast — burning max_attempts with
    backoff inside every executor task on a bad payload is pure waste."""
    attempt = 0
    while True:
        attempt += 1
        try:
            status = post_fn(cfg.url, body, headers)
            if status == 429 or status >= 500:
                raise IOError(f"HTTP {status}")
            if status >= 400:
                raise HttpClientError(f"HTTP {status}")
            return status
        except HttpClientError:
            raise
        except Exception:
            if attempt >= cfg.max_attempts:
                raise
            time.sleep(cfg.backoff_base_s * (2 ** (attempt - 1)))


def rest_batch_sink(
    df: DataFrame,
    cfg: RestSinkConfig,
    post_fn: PostFn = default_post,
    target_records_per_partition: int | None = None,
) -> dict[str, int]:
    """B4: ship a DataFrame to a REST endpoint, partition-parallel.

    Returns the E4 metrics dict {processed, sent, invalid, batches}.
    ``target_records_per_partition`` repartitions first so each executor
    POST loop handles a bounded record count (backpressure discipline —
    SURVEY.md §4 batching row); leave None to keep the upstream layout and
    avoid the extra shuffle.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    acc_processed = sc.accumulator(0)
    acc_sent = sc.accumulator(0)
    acc_invalid = sc.accumulator(0)
    acc_batches = sc.accumulator(0)

    if target_records_per_partition:
        n = df.count()
        parts = max(1, -(-n // target_records_per_partition))
        df = df.repartition(parts)

    cfg_headers = dict(cfg.headers or {})
    identity_key = cfg.identity_key
    columns = df.columns

    def send_partition(rows: Iterator) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        records = []
        for row in rows:
            rec = dict(zip(columns, row))
            acc_processed.add(1)
            if rec.get(identity_key) is None:
                acc_invalid.add(1)
                continue
            if cfg.drop_null_values:
                rec = {k: v for k, v in rec.items() if v is not None}
            records.append(rec)
        for idx, chunk in enumerate(chunkify(records, cfg.payload_size)):
            bid = _batch_id(pid, idx, chunk, identity_key)
            payload = {cfg.wrapper_key: chunk, "batch_id": bid}
            headers = {"Content-Type": "application/json", **cfg_headers}
            if cfg.jwt_secret:
                headers["Authorization"] = "Bearer " + _jwt_hs256(
                    {"batch_id": bid, "n": len(chunk)}, cfg.jwt_secret
                )
            body = json.dumps(payload, default=str).encode("utf-8")
            _post_with_retry(post_fn, cfg, body, headers)
            acc_batches.add(1)
            acc_sent.add(len(chunk))

    df.foreachPartition(send_partition)
    return {
        "processed": acc_processed.value,
        "sent": acc_sent.value,
        "invalid": acc_invalid.value,
        "batches": acc_batches.value,
    }


def rest_csv_batch_sink(
    df: DataFrame,
    cfg: RestSinkConfig,
    post_fn: PostFn = default_post,
    max_bytes: int = 4_500_000,
    chunk_strategy: str = "bytes",
) -> dict[str, int]:
    """B5: Netcore-shaped CSV sink — per partition, rows render to CSV
    lines and ship in byte-capped chunks (reference probes the cap by
    iterative halving, martech_pipelines/hooks/netcore.py:103-119; we size
    each chunk directly from encoded lengths in one pass).

    ``chunk_strategy``: ``"bytes"`` (default) sizes every chunk directly
    and guarantees the cap; ``"probe"`` reproduces the reference's
    first-chunk divisor probe + uniform record-count chunks
    (``probe_uniform_chunks``) for ported jobs that depend on the
    reference's batch boundaries.

    Header travels with every chunk (each POST is a standalone CSV)."""
    if chunk_strategy not in ("bytes", "probe"):
        raise ValueError(f"unknown chunk_strategy: {chunk_strategy!r}")
    spark = df.sparkSession
    sc = spark.sparkContext
    acc_sent = sc.accumulator(0)
    acc_batches = sc.accumulator(0)
    columns = df.columns
    header = ",".join(columns)

    def csv_cell(v) -> str:
        if v is None:
            return ""
        s = str(v)
        if any(ch in s for ch in (",", '"', "\n")):
            s = '"' + s.replace('"', '""') + '"'
        return s

    def send_partition(rows: Iterator) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        lines = (",".join(csv_cell(v) for v in row) for row in rows)
        if chunk_strategy == "probe":
            chunks = probe_uniform_chunks(list(lines), max_bytes)
        else:
            chunks = chunkify_by_bytes(lines, max_bytes)
        for idx, chunk in enumerate(chunks):
            body = ("\n".join([header, *chunk]) + "\n").encode("utf-8")
            bid = hashlib.sha256(f"{pid}:{idx}:{len(chunk)}".encode()).hexdigest()[:24]
            headers = {
                "Content-Type": "text/csv",
                "X-Batch-Id": bid,
                **(cfg.headers or {}),
            }
            _post_with_retry(post_fn, cfg, body, headers)
            acc_batches.add(1)
            acc_sent.add(len(chunk))

    df.foreachPartition(send_partition)
    return {"sent": acc_sent.value, "batches": acc_batches.value}


def write_training_shards(
    df: DataFrame,
    path: str,
    shards: int = 64,
    id_col: str = "doc_id",
    token_col: str | None = None,
    fmt: str = "parquet",
    salt: str = "shard",
) -> dict:
    """Training-corpus shard writer: deterministic shard assignment +
    loader manifest — the materialization step after a prep pipeline
    (pipe1/pipe2) that a distributed training job reads.

    Shard = md5(salt:id) % shards, the same engine/partitioning-invariant
    hash as the deterministic sampler (operators/text.py:md5_bucket32):
    re-running on re-ordered or re-partitioned input assigns every row to
    the SAME shard, so shard->dataloader-worker maps are reproducible and
    incremental re-writes don't reshuffle history. Physical layout is one
    directory per shard (``partitionBy``) with the data pre-clustered by
    a shard-keyed ``repartition`` so each shard directory gets a bounded
    file count, not one file per upstream task.

    Writes ``_manifest.json`` next to the shards with per-shard row (and
    optional token) totals, computed from the frame in one aggregation —
    loaders size work without scanning parquet footers. Local-FS manifest
    write; an object-store deployment routes it through the same hook as
    the gzip sink (sources/objectstore.py). Returns the manifest."""
    import json
    import os

    from martech_pipelines_spark.operators.text import md5_bucket32

    shard_col = (md5_bucket32(F.col(id_col).cast("string"), salt) % shards).cast(
        "int"
    )
    out = df.withColumn("__shard", shard_col)
    (
        out.repartition(shards, F.col("__shard"))
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("__shard")
        .save(path)
    )
    aggs = [F.count("*").alias("rows")]
    if token_col:
        aggs.append(F.sum(token_col).cast("long").alias("tokens"))
    stats = out.groupBy("__shard").agg(*aggs).collect()
    manifest = {
        "shards": shards,
        "salt": salt,
        "per_shard": {
            str(r["__shard"]): {
                k: r[k] for k in (["rows", "tokens"] if token_col else ["rows"])
            }
            for r in stats
        },
        "total_rows": sum(r["rows"] for r in stats),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


# --- small-file compaction for hive-partitioned layouts ----------------------


def _leaf_swap_names(root: str, leaf: str) -> tuple[str, str]:
    """Dot-prefixed siblings for the leaf swap: Spark's partition
    discovery ignores '.'/'_' entries, so readers never see an
    in-flight or abandoned swap as a PHANTOM partition value.  (This
    does NOT make the swap atomic for concurrent readers — between the
    two renames the live leaf is briefly absent; see
    ``compact_partition_dirs`` for the maintenance contract.)"""
    import os

    return (
        os.path.join(root, f".compact.{leaf}.next"),
        os.path.join(root, f".compact.{leaf}.old"),
    )


def recover_partition_swaps(root: str) -> None:
    """Crash recovery for ``compact_partition_dirs``: per leaf, drop a
    stale ``.next`` (died mid-write — the live leaf is intact), restore
    from ``.old`` when the leaf is missing (died between renames), drop
    ``.old`` when the leaf is present (died before cleanup).  Cheap
    (one listdir) — layout readers and the compactor both start here so
    an interrupted compaction self-heals."""
    import os
    import shutil

    if not os.path.isdir(root):
        return
    for d in os.listdir(root):
        if not d.startswith(".compact."):
            continue
        leaf = d[len(".compact."):].rsplit(".", 1)[0]
        nxt, old = _leaf_swap_names(root, leaf)
        live = os.path.join(root, leaf)
        if d.endswith(".next") and os.path.isdir(nxt):
            shutil.rmtree(nxt)
        elif d.endswith(".old"):
            if not os.path.isdir(live):
                os.rename(old, live)
            else:
                shutil.rmtree(old)


def compact_partition_dirs(
    spark, root: str, max_files: int = 1
) -> dict:
    """Small-file compaction for a HIVE-PARTITIONED layout (the a12
    event store): every leaf ``col=value`` directory holding more than
    ``max_files`` parquet files is rewritten to ``max_files`` via
    coalesce and swapped in with the two-rename protocol — the nightly
    answer to the streaming-ingest small-files problem (each
    micro-batch appends a file per partition; scan cost at 100 TB is
    driven by FILE COUNT as much as bytes, and a partition's read
    degenerates to open/footer overhead long before data volume
    matters).

    Only dirty leaves are touched (contrast ``compact_batch_dirs``,
    which folds a whole batch-keyed root); content multiset per leaf is
    unchanged (pinned in tests) and a crash at ANY point self-heals via
    ``recover_partition_swaps``.  Returns {leaf: files_before} for the
    leaves rewritten.  OFFLINE-maintenance contract — run with ingest
    AND reads paused: directories cannot be rename-replaced atomically,
    so between the two renames the live leaf is briefly absent and a
    concurrent reader would silently miss that partition's rows (the
    dot-prefix only prevents phantom partitions, not the gap).  A
    deployment that needs concurrent reads should compact behind a
    view/manifest flip instead."""
    import os
    import shutil

    recover_partition_swaps(root)
    done = {}
    for leaf in sorted(os.listdir(root)):
        live = os.path.join(root, leaf)
        if "=" not in leaf or not os.path.isdir(live):
            continue
        files = [f for f in os.listdir(live) if f.endswith(".parquet")]
        if len(files) <= max_files:
            continue
        nxt, old = _leaf_swap_names(root, leaf)
        spark.read.parquet(live).coalesce(max_files).write.mode(
            "overwrite"
        ).parquet(nxt)
        os.rename(live, old)
        os.rename(nxt, live)
        shutil.rmtree(old)
        done[leaf] = len(files)
    return done
