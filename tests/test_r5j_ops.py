"""Round-5j: JSON-lines source — quarantine semantics."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from martech_pipelines_spark.plans.corpus_r5j import (
    _CORRUPT_LINES,
    _JSONL_SCHEMA,
    write_events_jsonl,
)
from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.sources.readers import read_jsonl

SF = "/root/testdata/sf0.001"


def test_jsonl_quarantine_captures_exactly_the_corrupt_lines(spark):
    path = write_events_jsonl(spark, SF)
    # cache the parsed result: Spark refuses queries over raw JSON whose
    # pruned projection is ONLY the internal corrupt-record column
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = read_jsonl(spark, path, _JSONL_SCHEMA).cache()
    try:
        bad = df.where(F.col("_corrupt_record").isNotNull())
        got = sorted(r["_corrupt_record"] for r in bad.collect())
        # the type-mismatch line keeps its parseable fields NULL but is
        # still quarantined with the raw text; broken lines too
        assert got == sorted(_CORRUPT_LINES)
        n_good = df.where(F.col("_corrupt_record").isNull()).count()
    finally:
        df.unpersist()
    n_src = (
        load_table(spark, SF, "events")
        .where(F.col("event_id") % 10 == 0)
        .count()
    )
    assert n_good == n_src


def test_jsonl_failfast_alternative_raises(spark):
    """The same file under FAILFAST refuses the scan — documenting why
    the PERMISSIVE+quarantine mode is the default."""
    import pytest
    from py4j.protocol import Py4JJavaError

    path = write_events_jsonl(spark, SF)
    with pytest.raises(Exception):
        (
            spark.read.schema(_JSONL_SCHEMA)
            .option("mode", "FAILFAST")
            .json(path)
            .count()
        )
