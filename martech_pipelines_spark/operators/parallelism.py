"""Scan-parallelism repair for CPU-heavy kernels (optimization guide §2.5).

The shipped testdata tiers are single-file, single-row-group parquet, so
a bare scan yields 1-2 input partitions no matter how many cores the
session has.  That is harmless for I/O-light queries (AQE re-spreads at
the first exchange), but an operator whose *pre-shuffle* stage is
CPU-dominated — MinHash/shingle hashing, per-token language ID,
quantized-vector fan-outs — inherits the scan's parallelism and runs
its whole map stage on 1-2 cores out of 32 (measured: dd20's six
shingle stages each ran 2 tasks x ~5 s; executor-time sum 59 s against
a 1.9 s 32-core floor).

``spread()`` is the guide's "repartition immediately after the read"
fix for unsplittable inputs, made scale-adaptive: it is a NO-OP when
the input already has at least ``defaultParallelism`` partitions — i.e.
on any real multi-file/multi-row-group table (the 100-TB path, where a
corpus-wide repartition would be a catastrophic extra shuffle) it does
nothing, and on a narrow local scan it pays one tiny exchange of the
projected columns to unlock every core for the expensive map work.

Callers must project to the columns the kernel needs BEFORE spreading
(guide §2.3: shuffle fewer bytes) and should pass the kernel's eventual
grouping key as ``by`` so the exchange doubles as the kernel's keyed
partitioning (guide §2.4: two operations keyed the same way share one
exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# A/B kill-switch (tools/ab_compare.py): False makes every spread() a
# no-op so the pre-spread plan shape can be timed in the same session.
_SPREAD_ENABLED = True


def spread(df: DataFrame, by: str | None = None, target: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``target`` (default: session default
    parallelism) partitions iff it currently has fewer — hash on ``by``
    when given (deterministic, and reusable by a downstream groupBy on
    the same key), round-robin otherwise."""
    if not _SPREAD_ENABLED:
        return df
    spark = df.sparkSession
    tgt = target or spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # un-analyzable input (e.g. streaming) — leave as-is
        return df
    if n >= tgt:
        return df
    return df.repartition(tgt, F.col(by)) if by else df.repartition(tgt)
