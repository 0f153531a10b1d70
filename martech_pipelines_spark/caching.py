"""Session-scoped registry of persisted intermediate DataFrames.

Operators that persist an intermediate (e.g. the MinHash per-doc
signature table, operators/dedup.py) register the handle here so callers
can release the cache *after* their action completes — unpersisting
inside the operator would defeat the multi-branch reuse the persist
exists for, and never unpersisting accumulates cached tables across
repeated invocations in one session (bench loops, corpus sweeps) until
memory/disk eviction pressure.

Usage:
    df = register(df.persist(...))   # inside the operator
    ...caller runs its action...
    release()                        # caller-side, after the action
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Record a persisted DataFrame for later caller-side release."""
    _REGISTRY.append(df)
    return df


def release(blocking: bool = False) -> int:
    """Unpersist every registered intermediate; returns how many."""
    n = 0
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
