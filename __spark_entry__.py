"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``martech_pipelines_spark``; this file is the thin
driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF0001 = "/root/testdata/sf0.001"


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Runtime confs the corpus depends on, applied to WHATEVER session the
    driver hands us: the TIMESTAMP(NANOS) legacy mapping (inert when the
    testdata is TIMESTAMP(MICROS) — readers sniff the parquet footer per
    path and only use the nanos-as-long path when the column really is
    nanos; see sources.readers._is_nanos), and a UTC session timezone so
    formatted-timestamp outputs match the DuckDB oracle's naive reads
    regardless of the host's default timezone. AQE is a performance
    nicety only; correctness never depends on it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The E2 CDC compaction pipeline: change-type pass-list -> newest row
    per user -> export projection (SURVEY.md §2 E2/C4/C5/E1/H2/F6/F10).
    """
    _ensure_nanos_conf(spark)
    from martech_pipelines_spark.plans import QUERIES

    return QUERIES["flagship_cdc_dedup"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from martech_pipelines_spark.plans import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            # Release the PREVIOUS query's operator-persisted intermediates:
            # the driver runs ~90 queries in one session, and without this
            # each MinHash invocation's cache would accumulate (the registry
            # holds strong refs, so ContextCleaner can't reclaim them).
            # Releasing on entry (not exit) keeps the current query's cache
            # alive until the driver's action has consumed it.
            from martech_pipelines_spark import caching

            caching.release()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only check)."""
    from martech_pipelines_spark.plans import ORACLE

    return dict(ORACLE)
