"""Round-5l: erasure with audit, campaign report composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.operators.transforms import (
    erase_keys,
    erasure_audit,
)
from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_erasure_removes_every_target_and_nothing_else(spark):
    ev = load_table(spark, SF, "events")
    ids = ev.where(F.col("user_id") % 7 == 0).select("user_id").distinct()
    cleaned = erase_keys(ev, ids, "user_id")
    # nothing targeted survives
    assert cleaned.join(ids, "user_id", "left_semi").count() == 0
    # nothing else was touched
    keep = ev.join(ids, "user_id", "left_anti")
    assert cleaned.count() == keep.count()
    audit = erasure_audit(ev, cleaned, ids, "user_id", "events").first()
    assert audit["leftover_rows"] == 0
    assert audit["rows_before"] == audit["rows_after"] + audit["rows_removed"]
    assert audit["rows_removed"] > 0


def test_erasure_scrub_is_broadcast_no_shuffle_of_fact(spark):
    ev = load_table(spark, SF, "events")
    ids = ev.where(F.col("user_id") % 7 == 0).select("user_id").distinct()
    plan = plan_of(erase_keys(ev, ids, "user_id"), "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the only hash exchange allowed is the ids-side DISTINCT inside the
    # broadcast build — i.e. it must appear BELOW the BroadcastExchange
    # in the root-first plan text; the fact scan feeds the join directly
    exchanges = [
        i for i, l in enumerate(plan.splitlines())
        if "Exchange hashpartitioning" in l
    ]
    bx = [
        i for i, l in enumerate(plan.splitlines())
        if "BroadcastExchange" in l
    ]
    assert len(exchanges) <= 1, plan
    assert all(e > bx[0] for e in exchanges), plan


def test_campaign_report_internal_consistency(spark):
    rows = QUERIES["pipe9_campaign_report"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["views"] + r["clicks"] + r["purchases"] <= r["n_events"]
        assert r["reach"] <= r["n_events"]
        assert 0 <= r["conv_rate"] <= 1
        if r["purchases"] == 0:
            assert r["revenue_paise"] == 0


def test_exact_percentiles_match_sorted_selection(spark):
    """r29's histogram selection == percentile-by-sorting on the raw
    values (the definition it claims): smallest y covering ceil(q*n)."""
    import math

    ev = load_table(spark, SF, "events").where(F.col("value").isNotNull())
    vals = {}
    for r in ev.select("event_type", F.floor(F.col("value") * 100).cast("long").alias("y")).collect():
        vals.setdefault(r["event_type"], []).append(r["y"])
    got = {r["event_type"]: r for r in QUERIES["r29_exact_percentiles"](spark, SF).collect()}
    for et, ys in vals.items():
        ys.sort()
        n = len(ys)
        for q_, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            want = ys[math.ceil(q_ * n) - 1]
            assert got[et][name] == want, (et, name)
        assert got[et]["n"] == n


def test_debounce_burst_semantics(spark):
    """5 clicks 20s apart: lag-debounce at 60s keeps only the first
    (each is <60s from its predecessor); an event 61s after the last
    kept predecessor survives."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=20 * i), 1, "click", None)
        for i in range(5)
    ] + [(99, base + dt.timedelta(seconds=80 + 61), 1, "click", None)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    kept = lagged.where(
        F.col("prev_ts").isNull()
        | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 60 * 1_000_000)
    )
    assert sorted(r["event_id"] for r in kept.collect()) == [0, 99]


def test_langid_confusion_cells_match_t3_recount(spark):
    """Matrix cells == brute-force recount of t3's per-doc predictions
    joined to declared labels.  (On this synthetic corpus the matrix
    correctly EXPOSES that 'de' docs mostly score as 'en' — the
    documents carry English marker words — which is exactly the signal
    a confusion matrix exists to surface, so no diagonal assertion.)"""
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    pred = QUERIES["t3_lang_id"](spark, SF).select("doc_id", "lang_pred")
    joined = docs.join(pred, "doc_id").collect()
    brute = {}
    for r in joined:
        key = (r["lang"], r["lang_pred"])
        brute[key] = brute.get(key, 0) + 1
    rows = QUERIES["t36_langid_confusion"](spark, SF).collect()
    got = {(r["actual"], r["predicted"]): r["n"] for r in rows}
    assert got == brute
    # shares are a distribution per actual-language row
    by_actual = {}
    for r in rows:
        by_actual.setdefault(r["actual"], []).append(r["row_share"])
    for actual, shares in by_actual.items():
        assert abs(sum(shares) - 1.0) < 1e-4
