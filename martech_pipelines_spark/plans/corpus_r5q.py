"""Round-5q corpus addition: ORC source round-trip.

``a10_orc_roundtrip`` — the remaining built-in columnar format: the
customer table written to ORC (zlib, Spark's native writer) and read
back through ``sources.read_orc``; the read-back rows are oracle-checked
value-identical against the parquet source of truth, proving the format
path end to end (type mapping, predicate-capable scan).  Parquet, CSV,
JSON-lines, text-conf and binaryFile already have corpus entries
(a1/a5/a9/a4/mm1); ORC closes the set of formats Spark ships without
extra packages (Avro needs the external spark-avro artifact — import-
gated, out of scope for this container).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.sources.readers import read_orc


def write_customer_orc(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the deterministic ORC copy of customer.  Path keyed
    by full dataset path + pid (same hygiene as a9's jsonl log: no
    cross-sf aliasing, no concurrent-session overwrite races)."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out_dir = os.path.join("/tmp", f"mp_spark_orc_{tag}_{os.getpid()}")
    load_table(spark, sf_dir, "customer").coalesce(4).write.mode(
        "overwrite"
    ).orc(out_dir)
    return out_dir


@q("a10_orc_roundtrip", "SELECT * FROM customer")
def a10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the ORC source: customer written with Spark's
    native ORC writer, read back via ``read_orc``, compared against the
    parquet source of truth — longs, strings and doubles must all map
    through ORC's type system unchanged.  Filter pushdown into the ORC
    scan is plan-asserted in pytest (ORC supports predicate pushdown
    like parquet; a format path that silently full-scans would be a
    100-TB regression)."""
    path = write_customer_orc(spark, sf_dir)
    return read_orc(spark, path)
