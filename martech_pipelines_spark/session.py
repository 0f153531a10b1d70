"""SparkSession factory with scale-aware defaults.

The reference builds its session with a bare ``SparkSession.builder
.getOrCreate()`` (reference: martech_pipelines/tasks/base.py:26) and relies
on the Databricks runtime for tuning. Here the engine owns its config:

- AQE on (runtime re-plan: broadcast conversion, partition coalescing,
  skew-join splitting) — the single most important knob for 100-TB runs.
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster AQE's coalescePartitions makes the static number mostly
  irrelevant as long as it is not too small.
- Session timezone UTC: the testdata parquet stores naive timestamps, and
  the DuckDB oracle reads them naively, so UTC keeps Spark's collected
  values bit-identical to the oracle. The reference's IST anchoring
  (reference: martech_pipelines/utils/date_time.py:4) is honored *inside*
  the specific functions that need it via explicit ``Asia/Kolkata``
  conversions (see functions.datetime_fns), never via session tz.
- Arrow enabled for any pandas-UDF path (extended operators only).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

IST = "Asia/Kolkata"


def get_spark(
    app_name: str = "martech_pipelines_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``master=None`` with a pre-set master URL in the env and
    the builder leaves it to spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Parquet TIMESTAMP(NANOS) (pandas-written) has no Spark timestamp
        # mapping; read as long and convert in sources.readers.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
