"""Round-5j corpus addition: JSON-lines ingestion with quarantine.

``a9_jsonl_scan`` — the missing source format: a JSON-lines log
(deterministically derived from events, with planted corrupt lines) read
back through ``sources.read_jsonl``'s explicit-schema PERMISSIVE scan;
good rows are oracle-checked against the relational source of truth and
the corrupt-line quarantine count is pinned in pytest.

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.sources.readers import read_jsonl

_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value_c", T.DoubleType()),
    ]
)

_CORRUPT_LINES = [
    '{"event_id": "not a number"}',
    "{broken json",
    '["wrong", "shape"]',
]


def write_events_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the deterministic JSON-lines log: every 10th event as
    a JSON object plus three planted corrupt lines.  Rewritten per call
    (overwrite) so the corpus query is self-contained and idempotent."""
    import hashlib

    # key the path by the FULL dataset path (two sf_dirs sharing a
    # basename must not collide) and by pid (a concurrent session's
    # overwrite must not delete files this session is mid-scan on)
    tag = hashlib.md5(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:8]
    out_dir = os.path.join(
        "/tmp", f"mp_spark_jsonl_{tag}_{os.getpid()}"
    )
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 10 == 0)
    good = ev.select(
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                F.round(F.col("value"), 2).alias("value_c"),
            )
        ).alias("value")
    )
    bad = spark.createDataFrame([(l,) for l in _CORRUPT_LINES], "value string")
    good.unionByName(bad).coalesce(4).write.mode("overwrite").text(out_dir)
    return out_dir


@q(
    "a9_jsonl_scan",
    """
    SELECT event_id, user_id, event_type, round(value, 2) AS value_c
    FROM events WHERE event_id % 10 = 0
    """,
)
def a9_jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the JSON-lines source: events serialized to a
    jsonl log (with three planted corrupt lines), read back via the
    explicit-schema PERMISSIVE scan, quarantine filtered out — and the
    surviving rows must be value-identical to the relational source of
    truth (doubles round-trip exactly because JSON shortest-repr parses
    back to the same double).  The quarantine side (corrupt count == 3,
    raw lines preserved) is pinned in pytest."""
    path = write_events_jsonl(spark, sf_dir)
    df = read_jsonl(spark, path, _JSONL_SCHEMA)
    return df.where(F.col("_corrupt_record").isNull()).select(
        "event_id", "user_id", "event_type", "value_c"
    )
