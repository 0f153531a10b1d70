"""Round-5f: propensity training-set builder and cumulative reach —
leakage boundaries and curve invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"
_WEEK_US = 7 * 86400 * 1_000_000


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _label_on(spark, rows):
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    base = ev.select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts")).alias(
            "p_us"
        ),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(1, _WEEK_US)
    )
    return {
        r["event_id"]: r["label"]
        for r in base.select(
            "event_id",
            "event_type",
            (F.count("p_us").over(wf) > 0).alias("label"),
        )
        .where(F.col("event_type") == "view")
        .collect()
    }


def test_pipe7_label_boundaries(spark):
    """Same-instant purchase does NOT label (strict future); a purchase
    exactly 7 days later DOES (inclusive frame end); 7d+1us does not."""
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "view", None),
        (2, _ts("2024-01-01 00:00:00"), 1, "purchase", 1.0),  # same instant
        (3, _ts("2024-01-02 00:00:00"), 2, "view", None),
        (4, _ts("2024-01-09 00:00:00"), 2, "purchase", 1.0),  # exactly +7d
        (5, _ts("2024-01-03 00:00:00"), 3, "view", None),
        (6, _ts("2024-01-10 00:00:00.000001"), 3, "purchase", 1.0),  # +7d+1us
    ]
    labels = _label_on(spark, rows)
    assert labels[1] is False
    assert labels[3] is True
    assert labels[5] is False


def test_pipe7_positive_rate_sane_and_single_exchange(spark):
    df = QUERIES["pipe7_propensity_training_set"](spark, SF)
    # plan BEFORE execution: after collect, AQE's final plan may show
    # per-stage exchange bookkeeping that double-counts the one shuffle
    plan = plan_of(df, "simple")
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1, plan
    rows = df.collect()
    assert len(rows) > 0
    pos = sum(1 for r in rows if r["will_purchase_7d"])
    assert 0 < pos < len(rows)  # neither degenerate class


def test_r28_curve_invariants(spark):
    rows = sorted(
        QUERIES["r28_cumulative_reach"](spark, SF).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) > 1
    total_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cum_users"] == total_users
    cum = 0
    for r in rows:
        assert r["new_users"] <= r["active_users"]
        cum += r["new_users"]
        assert r["cum_users"] == cum
    # day 1: everyone active is new
    assert rows[0]["new_users"] == rows[0]["active_users"]
