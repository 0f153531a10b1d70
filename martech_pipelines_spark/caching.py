"""Session-scoped registry of persisted intermediate DataFrames.

Operators that persist an intermediate (e.g. the MinHash per-doc
signature table, operators/dedup.py) register the handle here so callers
can release the cache *after* their action completes — unpersisting
inside the operator would defeat the multi-branch reuse the persist
exists for, and never unpersisting accumulates cached tables across
repeated invocations in one session (bench loops, corpus sweeps) until
memory/disk eviction pressure.

Two release modes:

- ``scope()`` — the safe form. Releases ONLY the handles registered
  inside the ``with`` block, so concurrent query construction elsewhere
  in the session (threads, parallel drivers) keeps its live caches:

      with caching.scope():
          df = dedup.minhash_near_duplicates(...)
          df.collect()

- ``release()`` — drains the WHOLE registry. Correct only under the
  sequential-driver assumption (one query built + executed at a time,
  as the bench loop and the gate driver do); with concurrent callers it
  would unpersist another query's cache mid-action. Prefer ``scope()``.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []
_LOCK = threading.Lock()


def register(df: DataFrame) -> DataFrame:
    """Record a persisted DataFrame for later caller-side release."""
    with _LOCK:
        _REGISTRY.append(df)
    return df


def _release_from(mark: int, blocking: bool) -> int:
    n = 0
    while True:
        with _LOCK:
            if len(_REGISTRY) <= mark:
                return n
            df = _REGISTRY.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass


def release(blocking: bool = False) -> int:
    """Unpersist EVERY registered intermediate; returns how many.

    Global drain — assumes a sequential driver (see module docstring).
    """
    return _release_from(0, blocking)


@contextmanager
def scope(blocking: bool = False) -> Iterator[None]:
    """Release only the caches registered within this block on exit."""
    with _LOCK:
        mark = len(_REGISTRY)
    try:
        yield
    finally:
        _release_from(mark, blocking)
