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
