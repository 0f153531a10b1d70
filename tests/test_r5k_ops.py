"""Round-5k: RFM segmentation and incremental basket maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_rfm_scores_and_segments(spark):
    rows = QUERIES["mart13_rfm"](spark, SF).collect()
    n_cust = load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    assert len(rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["segment"] in {
            "champion", "loyal", "at_risk", "hibernating", "regular"
        }
    # quintiles are balanced: bucket sizes differ by at most 1
    for col in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)
    # champion really is best-bucket on all three
    for r in rows:
        if r["segment"] == "champion":
            assert r["r_score"] >= 4 and r["f_score"] >= 4 and r["m_score"] >= 4


def test_incremental_baskets_equals_full(spark):
    inc = QUERIES["h15_incremental_baskets"](spark, SF)
    full = QUERIES["mart10_basket_affinity"](spark, SF)
    a = {tuple(r) for r in inc.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b and len(a) > 0
