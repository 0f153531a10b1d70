"""Round-5e operators: point-in-time features, negative sampling,
unpivot, basket affinity — leakage, determinism and invariant gates."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


# --- fe1: point-in-time features --------------------------------------------


def _fe1_on(spark, rows):
    """Run the fe1 window logic on a hand-built events frame."""
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    base = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == "view").cast("long").alias("is_view"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100).cast("long"),
        ).alias("p_paise"),
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts")).alias(
            "p_us"
        ),
    )
    week = 7 * 86400 * 1_000_000
    w7 = Window.partitionBy("user_id").orderBy("us").rangeBetween(-week, -1)
    wp = Window.partitionBy("user_id").orderBy("us").rangeBetween(
        Window.unboundedPreceding, -1
    )
    return (
        base.select(
            "user_id", "event_id", "event_type",
            F.coalesce(F.sum("is_view").over(w7), F.lit(0)).alias(
                "n_views_7d"
            ),
            F.count("p_us").over(wp).alias("n_purchases_before"),
            F.coalesce(F.sum("p_paise").over(wp), F.lit(0)).alias(
                "spend_before_paise"
            ),
        )
        .where(F.col("event_type") == "purchase")
        .collect()
    )


def test_fe1_same_timestamp_event_never_leaks(spark):
    """A view at EXACTLY the purchase's timestamp is not 'before' it —
    the RANGE frame's strict-past boundary excludes it."""
    rows = [
        (1, _ts("2024-01-10 12:00:00"), 1, "view", None),  # same instant
        (2, _ts("2024-01-10 11:00:00"), 1, "view", None),  # 1h earlier
        (3, _ts("2024-01-10 12:00:00"), 1, "purchase", 10.0),
    ]
    (r,) = _fe1_on(spark, rows)
    assert r["n_views_7d"] == 1  # only the 11:00 view


def test_fe1_window_boundaries_and_cumulative(spark):
    rows = [
        (1, _ts("2024-01-01 12:00:00"), 1, "view", None),      # 9d old: out
        (2, _ts("2024-01-05 12:00:00"), 1, "view", None),      # 5d old: in
        (3, _ts("2024-01-02 00:00:00"), 1, "purchase", 5.0),   # prior buy
        (4, _ts("2024-01-10 12:00:00"), 1, "purchase", 20.0),
    ]
    by_id = {r["event_id"]: r for r in _fe1_on(spark, rows)}
    late = by_id[4]
    assert late["n_views_7d"] == 1
    assert late["n_purchases_before"] == 1
    assert late["spend_before_paise"] == 500
    early = by_id[3]
    assert early["n_purchases_before"] == 0
    assert early["spend_before_paise"] == 0


def test_fe1_plan_single_exchange(spark):
    plan = plan_of(QUERIES["fe1_pit_features"](spark, SF), "simple")
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1, plan


# --- s14: negative sampling --------------------------------------------------


def test_s14_negatives_were_never_purchased(spark):
    neg = QUERIES["s14_negative_sampling"](spark, SF)
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    purchased = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("neg_partkey"),
        )
        .distinct()
    )
    leaked = neg.join(purchased, ["custkey", "neg_partkey"], "inner").count()
    assert leaked == 0


def test_s14_at_most_k_per_user_and_deterministic(spark):
    neg = QUERIES["s14_negative_sampling"](spark, SF)
    per_user = neg.groupBy("custkey").count().collect()
    assert all(r["count"] <= 5 for r in per_user)
    assert len(per_user) > 0
    # rerun == identical sample (hash-addressed, no RNG state)
    a = {tuple(r) for r in neg.collect()}
    b = {tuple(r) for r in QUERIES["s14_negative_sampling"](spark, SF).collect()}
    assert a == b


# --- r27: unpivot ------------------------------------------------------------


def test_unpivot_round_trips_groupby(spark):
    long = QUERIES["r27_unpivot"](spark, SF)
    direct = (
        load_table(spark, SF, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    a = {(r["user_id"], r["event_type"], r["n"]) for r in long.collect()}
    b = {(r["user_id"], r["event_type"], r["n"]) for r in direct.collect()}
    assert a == b


def test_unpivot_adds_no_exchange_beyond_groupby(spark):
    plan = plan_of(QUERIES["r27_unpivot"](spark, SF), "simple")
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1, plan  # only the wide-frame groupBy


# --- mart10: basket affinity -------------------------------------------------


def test_basket_affinity_invariants(spark):
    rows = QUERIES["mart10_basket_affinity"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r["x"] < r["y"]
        assert 0 < r["support"] <= 1
        assert 0 < r["conf_x_y"] <= 1
        assert r["lift"] > 0
    # sorted by pair_cnt desc with (x, y) tiebreak
    counts = [r["pair_cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_basket_affinity_bruteforce_counts(spark):
    """pair_cnt for the returned pairs equals a brute-force recount."""
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    brute = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                brute[(ps[i], ps[j])] += 1
    for r in QUERIES["mart10_basket_affinity"](spark, SF).collect():
        assert brute[(r["x"], r["y"])] == r["pair_cnt"]
