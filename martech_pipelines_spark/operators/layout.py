"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A single-column sort gives parquet min/max pruning on that column only;
a Z-order sort interleaves the bits of several columns' rank buckets so
that rows close in ANY of the dimensions land close in the file order —
a 2-D box predicate then touches a small fraction of files/row-groups
instead of all of them. This is the technique behind Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse/DuckDB space-filling-curve
clustering, built here from plain Column arithmetic (shift/and/or), so
it is portable and DuckDB-oracle-checkable.

Scale notes: the key is pure codegen; the clustering write is ONE
``repartitionByRange`` on the key (a range shuffle — the same cost any
re-layout pays) plus a within-partition sort. The skipping benefit is
measured, not asserted: tests/test_r4_ops.py counts files containing
matches for a box query under z-order vs natural layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16
MAXB = (1 << BITS) - 1  # 65535


def _bucket(col: Column, mn: Column, mx: Column) -> Column:
    """Map ``col`` into [0, 2^BITS) by min/max normalization. Double
    arithmetic in a fixed order => identical buckets in any engine
    reading the same values."""
    span = mx - mn
    return F.when(span > 0, F.floor((col - mn) * float(MAXB) / span)).otherwise(
        F.lit(0)
    ).cast("long")


def zorder_key_from_buckets(a: Column, b: Column) -> Column:
    """Morton interleave of two BITS-wide bucket values: bit i of ``a``
    lands at position 2i+1, bit i of ``b`` at 2i. Unrolled shifts/ands —
    one flat codegen expression, no UDF."""
    parts = []
    for i in range(BITS):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def with_zorder_key(
    df: DataFrame, col_a: str, col_b: str, key_name: str = "zkey"
) -> DataFrame:
    """Attach the 2-D Z-order key: per-column min/max come from one tiny
    aggregate broadcast back (declarative — no driver collect)."""
    stats = df.agg(
        F.min(col_a).cast("double").alias("__mna"),
        F.max(col_a).cast("double").alias("__mxa"),
        F.min(col_b).cast("double").alias("__mnb"),
        F.max(col_b).cast("double").alias("__mxb"),
    )
    keyed = df.crossJoin(F.broadcast(stats))
    ba = _bucket(F.col(col_a).cast("double"), F.col("__mna"), F.col("__mxa"))
    bb = _bucket(F.col(col_b).cast("double"), F.col("__mnb"), F.col("__mxb"))
    return keyed.withColumn(key_name, zorder_key_from_buckets(ba, bb)).drop(
        "__mna", "__mxa", "__mnb", "__mxb"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` into ``n_files`` files by Z-order of (col_a, col_b):
    range-partition on the key (so each file owns a contiguous key range
    — that contiguity IS the skipping guarantee), sort within partitions,
    drop the key from the payload."""
    keyed = with_zorder_key(df, col_a, col_b)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> dict:
    """OPTIMIZE-style small-file compaction: rewrite a dataset directory
    so files approach ``target_bytes`` (the remedy for the many-small-
    files problem that streaming ingest and fine-grained partitioning
    leave behind — each file costs a task + open + footer parse at scan
    time, so 10k x 1 MB files scan far slower than 80 x 128 MB).

    Protocol (same atomic-swap discipline as the streaming upsert sink,
    streaming/stream.py::apply_upsert_batch): write the compacted copy to
    ``<path>.next``, rename live -> ``.old``, ``.next`` -> live, drop
    ``.old``. A crash between the renames leaves a complete ``.old``,
    which the next call restores before doing anything else — readers
    never observe a partial dataset.

    Returns a stats dict (files/bytes before, files after, skipped flag).
    No-ops when the dataset already has no more files than the target
    packing needs — compaction must be idempotent and cheap to re-run.

    Local-FS file sizing (os.walk); on HDFS/S3 the same listing comes
    from the FileSystem/ListObjectsV2 API — the swap protocol is the
    part that changes (S3 has no rename; you'd version the prefix).
    """
    import math
    import os
    import shutil

    old = path + ".old"
    nxt = path + ".next"
    # crash recovery first: a death between rename(live->old) and
    # rename(next->live) leaves no live dir but a complete .old
    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)
    shutil.rmtree(nxt, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            sizes.append(os.path.getsize(os.path.join(root, f)))
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_bytes))
    stats = {
        "files_before": len(sizes),
        "bytes_total": total,
        "files_target": n_out,
        "skipped": len(sizes) <= n_out,
    }
    if stats["skipped"]:
        stats["files_after"] = len(sizes)
        return stats

    df = spark.read.format(fmt).load(path)
    df.repartition(n_out).write.format(fmt).mode("overwrite").save(nxt)
    os.rename(path, old)
    os.rename(nxt, path)
    shutil.rmtree(old, ignore_errors=True)
    stats["files_after"] = sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if not (f.startswith("_") or f.startswith("."))
    )
    return stats
