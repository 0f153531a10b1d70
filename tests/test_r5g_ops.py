"""Round-5g: incremental reach maintenance and audience overlap —
merge idempotence, incremental==batch, sketch error gates."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.operators.transforms import (
    merge_user_days,
    reach_curve,
    user_days_of,
)
from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _curve_set(df):
    return {tuple(r) for r in df.collect()}


def test_h13_incremental_equals_batch(spark):
    inc = QUERIES["h13_incremental_reach"](spark, SF)
    full = QUERIES["r28_cumulative_reach"](spark, SF)
    assert _curve_set(inc) == _curve_set(full)


def test_h13_merge_is_idempotent_and_order_free(spark):
    ev = load_table(spark, SF, "events")
    b0 = ev.where(F.col("event_id") % 2 == 0)
    b1 = ev.where(F.col("event_id") % 2 == 1)
    once = merge_user_days(user_days_of(b0), b1)
    replay = merge_user_days(merge_user_days(user_days_of(b0), b1), b1)
    swapped = merge_user_days(user_days_of(b1), b0)
    assert _curve_set(reach_curve(once)) == _curve_set(reach_curve(replay))
    assert _curve_set(reach_curve(once)) == _curve_set(reach_curve(swapped))


def test_audience_overlap_invariants(spark):
    rows = QUERIES["mart11_audience_overlap"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["t1"] < r["t2"]
        assert 0 < r["overlap"] <= min(r["n1"], r["n2"])
        assert 0 < r["jaccard"] <= 1


def test_audience_overlap_hll_twin_within_error(spark):
    """The sketch form: HLL per audience + HLL of the union,
    inclusion-exclusion for the overlap — within rsd-derived error of
    the exact answer (the daily-report path that keeps no exact state)."""
    ev = load_table(spark, SF, "events")
    rsd = 0.02
    per = (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd).alias("n"))
        .collect()
    )
    n_of = {r["event_type"]: r["n"] for r in per}
    exact = {
        (r["t1"], r["t2"]): (r["n1"], r["n2"], r["overlap"])
        for r in QUERIES["mart11_audience_overlap"](spark, SF).collect()
    }
    for (t1, t2), (n1, n2, ov) in exact.items():
        union_est = (
            ev.where(F.col("event_type").isin(t1, t2))
            .agg(F.approx_count_distinct("user_id", rsd).alias("n"))
            .first()["n"]
        )
        est = n_of[t1] + n_of[t2] - union_est
        # inclusion-exclusion compounds three sketch errors; 5x rsd on
        # the involved magnitudes is a generous-but-meaningful gate
        tol = 5 * rsd * max(n1, n2, 1)
        assert abs(est - ov) <= tol, (t1, t2, est, ov, tol)
