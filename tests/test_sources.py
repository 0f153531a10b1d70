"""Reader robustness: parquet timestamp physical-unit sniffing.

Round-3 regression: the driver regenerated the testdata and ``events.ts``
flipped from TIMESTAMP(NANOS) (older pandas writer) to TIMESTAMP(MICROS).
``load_table`` hard-coded the nanos-as-long conversion, so every timestamp
came back 1000x too small (1970 dates) — h3/h5 returned 0 rows and every
``ts_str`` hash-mismatched (CORRECTNESS_r03). The fix sniffs the parquet
footer per path; these tests pin BOTH units round-tripping identically.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.sources.readers import _is_nanos

SF = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.001")

_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 7, 179575),
    dt.datetime(2024, 1, 15, 12, 30, 0, 500000),
    dt.datetime(2024, 1, 30, 23, 57, 12, 194062),
]


def _write_events(tmp_path, unit: str) -> str:
    sf_dir = str(tmp_path / f"sf_{unit}")
    os.makedirs(sf_dir)
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.Series(_TS, dtype=f"datetime64[{unit}]"),
            "user_id": [10, 20, 30],
            "event_type": ["purchase", "signup", "view"],
            "value": [1.5, 2.5, 3.5],
            "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}'],
        }
    )
    df.to_parquet(os.path.join(sf_dir, "events.parquet"), index=False)
    return sf_dir


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_roundtrips_both_timestamp_units(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    path = os.path.join(sf_dir, "events.parquet")
    assert _is_nanos(path, "ts") == (unit == "ns")
    got = sorted(
        (r["event_id"], r["ts"])
        for r in load_table(spark, sf_dir, "events").select("event_id", "ts").collect()
    )
    assert got == list(zip([1, 2, 3], _TS))


def test_real_testdata_ts_in_expected_range(spark):
    """The driver's tables must land in 2024, not 1970 — the exact failure
    mode of the unit mismatch (values 1000x too small)."""
    ev = load_table(spark, SF, "events")
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert row["lo"].year >= 2000, f"ts too small (unit bug?): {row['lo']}"
    assert row["hi"].year <= 2100, f"ts too large (unit bug?): {row['hi']}"


def test_read_evolving_parquet_merges_and_conforms(spark, tmp_path):
    """Schema evolution: files written before/after a column was added
    must read as one frame; conforming to an expected schema yields a
    stable shape with typed nulls for missing columns."""
    from pyspark.sql import types as T

    from martech_pipelines_spark.sources.readers import read_evolving_parquet

    d = str(tmp_path / "log")
    spark.createDataFrame([(1, "a")], "id long, v1 string").write.parquet(
        d + "/epoch=0"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v1 string, v2 double"
    ).write.parquet(d + "/epoch=1")

    merged = read_evolving_parquet(spark, d)
    assert {"id", "v1", "v2", "epoch"} <= set(merged.columns)
    rows = {r["id"]: r["v2"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}  # old file's missing column is null

    expected = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v2", T.DoubleType()),
            T.StructField("v3", T.StringType()),  # not in any file yet
        ]
    )
    conformed = read_evolving_parquet(spark, d, expected)
    assert conformed.columns == ["id", "v2", "v3"]
    got = {r["id"]: (r["v2"], r["v3"]) for r in conformed.collect()}
    assert got == {1: (None, None), 2: (9.5, None)}
