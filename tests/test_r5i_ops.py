"""Round-5i: incremental SCD2 maintenance and session path analysis."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from martech_pipelines_spark.operators import cdc
from martech_pipelines_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _scd_set(df):
    cols = ["user_id", "event_id", "valid_from", "valid_to", "is_current"]
    return {
        tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
    }


def test_h14_incremental_equals_full_rebuild(spark):
    inc = QUERIES["h14_incremental_scd2"](spark, SF)
    full = QUERIES["mart4_scd2"](spark, SF)
    assert _scd_set(inc) == _scd_set(full)


def test_scd2_apply_changes_hand_case(spark):
    schema = "user_id long, event_id long, ts timestamp"
    base = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00")),
            (1, 11, _ts("2024-01-02 00:00:00")),  # open row for key 1
            (2, 20, _ts("2024-01-01 12:00:00")),  # key untouched by delta
        ],
        schema,
    )
    delta = spark.createDataFrame(
        [
            (1, 12, _ts("2024-01-05 00:00:00")),
            (1, 13, _ts("2024-01-06 00:00:00")),
            (3, 30, _ts("2024-01-05 06:00:00")),  # brand-new key
        ],
        schema,
    )
    dim = cdc.scd2_from_changes(base, "user_id", "ts", ["event_id"])
    out = cdc.scd2_apply_changes(dim, delta, "user_id", "ts", ["event_id"])
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 6
    # key 1: old open row closed at the delta's FIRST new ts
    assert rows[11]["valid_to"] == _ts("2024-01-05 00:00:00")
    assert rows[11]["is_current"] is False
    # delta's own chain: 12 closed by 13, 13 open
    assert rows[12]["valid_to"] == _ts("2024-01-06 00:00:00")
    assert rows[13]["is_current"] is True
    # untouched key 2 still open; new key 3 open
    assert rows[20]["is_current"] is True
    assert rows[30]["is_current"] is True
    # exactly one open row per key
    open_per_key = {}
    for r in rows.values():
        if r["is_current"]:
            open_per_key[r["user_id"]] = open_per_key.get(r["user_id"], 0) + 1
    assert open_per_key == {1: 1, 2: 1, 3: 1}


def test_top_paths_partitioning_invariant(spark):
    from martech_pipelines_spark.sources import load_table

    base = QUERIES["mart12_top_paths"](spark, SF).collect()
    # rebuild from a deliberately re-partitioned source: collect_list
    # order would differ; array_sort must make the paths identical
    ev = load_table(spark, SF, "events").repartition(13)
    paths = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.count(F.when(F.col("path").contains("purchase"), 1)).alias(
                "n_converting"
            ),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
        .collect()
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in counted]
    for r in base:
        assert r["n_converting"] <= r["n_sessions"]
