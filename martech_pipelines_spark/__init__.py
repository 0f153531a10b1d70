"""martech_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference project ``gauravkumar-ny/martech-pipelines`` (a Databricks dbx
batch-ETL pipeline syncing user-profile data to marketing SaaS platforms).

Layout
------
- ``sources``    : explicit-schema readers (parquet/csv/text/table/range)
                   and the table schema registry.
- ``functions``  : the reference's scalar-function library re-expressed as
                   native Column expressions (no Python UDFs on the hot path).
- ``operators``  : CDC/incremental dedup, transform pipelines, sinks,
                   dedup/similarity/text/multimodal extended operators.
- ``plans``      : named query builders (the oracle-checked corpus).
- ``streaming``  : Structured Streaming variants of the incremental path.

Design stance (100-TB posture):
- DataFrame/SQL only; Catalyst owns the plan. No RDDs, no driver-side
  pandas on the data path, no ``collect()`` except tiny control tables.
- Explicit ``StructType`` schemas everywhere (no ``inferSchema``).
- Broadcast small dims, AQE on, partition-count discipline in sinks.
"""

from martech_pipelines_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
