"""Round-10 operator tests: the fixed-merge BPE oracle's precondition
and the HLL-vs-KMV estimator cross-gate (VERDICT r9 #3/#4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from martech_pipelines_spark.operators import sketches as SK
from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table

SF = "/root/testdata/sf0.001"

# Stated relative-error bounds (1 sigma) for the two estimator families;
# assertions use 3 sigma so a correct implementation essentially never
# flakes while a broken one (off by a constant factor) always fails.
_HLL_RSD = 0.05  # approx_count_distinct's default/requested rsd
_KMV_K = 64
_KMV_RSD = 1.0 / math.sqrt(_KMV_K - 2)  # classic KMV rsd ~ 1/sqrt(k-2)


def test_bpe_fixed_merges_precondition(spark):
    """The unrolled t14c oracle runs EXACTLY 8 merge rounds; the engine
    stops early when no pair repeats.  The two agree only while every
    round still has a pair_count >= 2 pair — pin that precondition at
    both sf tiers the driver touches, so a testdata regeneration that
    broke it fails loudly here instead of hash-drifting in the gate."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = QUERIES["t14c_bpe_fixed_merges"](spark, sf).collect()
        assert len(rows) == 8, f"{sf}: expected 8 merges, got {len(rows)}"
        assert min(r["pair_count"] for r in rows) >= 2
        assert [r["rank"] for r in rows] == list(range(8))


def test_bpe_fixed_merges_equals_t14b(spark):
    """t14c is t14b's value-checked twin: same operator, same budget —
    the results must be identical (the only difference is that t14c
    carries the unrolled DuckDB oracle)."""
    a = sorted(map(tuple, QUERIES["t14c_bpe_fixed_merges"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["t14b_bpe_learn"](spark, SF).collect()))
    assert a == b


def _cross_gate(df, key_col: str, val_col: str):
    """Exact vs HLL vs KMV on the same (key, value) pairs: each
    estimator within 3x its own stated rsd of the exact count, hence
    the two estimators within the combined envelope of each other —
    r3c's value-checked KMV now cross-gates the rows-only HLL family
    (VERDICT r9 #4)."""
    exact = {
        r[key_col]: r["n"]
        for r in df.groupBy(key_col)
        .agg(F.count_distinct(val_col).cast("long").alias("n"))
        .collect()
    }
    hll = {
        r[key_col]: r["est"]
        for r in df.groupBy(key_col)
        .agg(F.approx_count_distinct(val_col, _HLL_RSD).alias("est"))
        .collect()
    }
    kmv = {
        r[key_col]: r["kmv_est"]
        for r in SK.kmv_estimate(
            SK.kmv_sketch_table(df, key_col, val_col, k=_KMV_K),
            key_col,
            k=_KMV_K,
        ).collect()
    }
    assert set(exact) == set(hll) == set(kmv) and exact
    for key, n in exact.items():
        assert abs(hll[key] - n) <= 3 * _HLL_RSD * n + 1, (
            f"HLL out of bounds for {key}: {hll[key]} vs exact {n}"
        )
        assert abs(kmv[key] - n) <= 3 * _KMV_RSD * n + 1, (
            f"KMV out of bounds for {key}: {kmv[key]} vs exact {n}"
        )
        assert abs(hll[key] - kmv[key]) <= 3 * (_HLL_RSD + _KMV_RSD) * n + 2, (
            f"estimators disagree for {key}: hll {hll[key]} kmv {kmv[key]}"
        )


def test_hll_kmv_cross_gate_events(spark):
    ev = load_table(spark, SF, "events")
    _cross_gate(ev, "event_type", "user_id")


def test_hll_kmv_cross_gate_lineitem(spark):
    # the r3b keys: distinct parts per return flag
    li = load_table(spark, SF, "lineitem")
    _cross_gate(li, "l_returnflag", "l_partkey")
