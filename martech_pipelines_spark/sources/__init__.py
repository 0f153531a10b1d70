"""Sources: explicit-schema readers and the table schema registry."""

from martech_pipelines_spark.sources.schemas import SCHEMAS, TABLES, schema_for
from martech_pipelines_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_text_conf,
    range_source,
    register_views,
)

__all__ = [
    "SCHEMAS",
    "TABLES",
    "schema_for",
    "load_table",
    "load_tables",
    "read_csv",
    "read_text_conf",
    "range_source",
    "register_views",
]
