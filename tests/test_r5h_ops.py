"""Round-5h: entity resolution pipeline — precision (no false merges),
recall (every planted duplicate found), and survivorship."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_er_finds_every_planted_dup_and_nothing_else(spark):
    out = QUERIES["pipe8_entity_resolution"](spark, SF).collect()
    cust = load_table(spark, SF, "customer")
    n_planted = cust.where(F.col("c_custkey") % 3 == 0).count()
    # recall: one cluster per corrupted customer
    assert len(out) == n_planted
    for r in out:
        # precision: a cluster holds exactly the original + its twin —
        # rec ids 2k and 2k+1 (same entity), never a cross-entity merge
        assert r["n_records"] == 2
        assert r["cluster"] % 2 == 0
        assert r["golden_rec_id"] == r["cluster"]


def test_er_golden_record_is_pristine(spark):
    out = {
        r["cluster"]: r["golden_name"]
        for r in QUERIES["pipe8_entity_resolution"](spark, SF).collect()
    }
    names = {
        r["c_custkey"]: r["c_name"]
        for r in load_table(spark, SF, "customer").collect()
    }
    for cluster, golden in out.items():
        assert golden == names[cluster // 2]  # original, not the typo'd twin
        assert "x" not in golden.removeprefix("Customer#")
