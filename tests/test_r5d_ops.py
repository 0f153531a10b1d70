"""Round-5d operators: as-of join, bucketed range join, ROLLUP, pivot,
per-group OLS, ROC-AUC, embedding covariance + PCA, PageRank —
semantics, plan shape, and numeric gates."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import graph as G
from martech_pipelines_spark.operators import joins as J
from martech_pipelines_spark.operators import linalg as LA
from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


# --- asof_join ---------------------------------------------------------------


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 12:00:00"), 100),
            (1, _ts("2024-01-10 09:00:00"), 101),  # exact-tie with right
            (2, _ts("2024-01-10 12:00:00"), 200),  # match is too old
            (3, _ts("2024-01-10 12:00:00"), 300),  # no right rows at all
        ],
        "user_id long, ts timestamp, order_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 09:00:00"), 11),
            (1, _ts("2024-01-10 09:00:00"), 12),  # same ts: max id wins
            (1, _ts("2024-01-10 11:00:00"), 13),
            (1, _ts("2024-01-10 13:00:00"), 14),  # in the future: never
            (2, _ts("2024-01-01 00:00:00"), 21),
        ],
        "user_id long, view_ts timestamp, view_id long",
    )
    return left, right


def test_asof_join_semantics(spark, asof_frames):
    left, right = asof_frames
    out = J.asof_join(
        left,
        right,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_payload=["view_id"],
        tolerance=F.expr("INTERVAL 48 HOURS"),
    )
    rows = {r["order_id"]: r for r in out.collect()}
    assert len(rows) == 4  # every left row survives (left-outer)
    assert rows[100]["view_id_asof"] == 13  # latest at-or-before 12:00
    assert rows[101]["view_id_asof"] == 12  # inclusive boundary, max id
    assert rows[200]["view_id_asof"] is None  # 9.5 days old > tolerance
    assert rows[300]["view_id_asof"] is None  # no right rows
    assert rows[100]["view_ts_asof"] == _ts("2024-01-10 11:00:00")


def test_asof_join_no_tolerance_keeps_old_match(spark, asof_frames):
    left, right = asof_frames
    out = J.asof_join(
        left, right, ["user_id"], "ts", "view_ts", ["view_id"]
    )
    rows = {r["order_id"]: r for r in out.collect()}
    assert rows[200]["view_id_asof"] == 21


def test_asof_join_plan_single_exchange_no_join(spark):
    """The join-free formulation: one hash exchange, zero join nodes."""
    plan = plan_of(QUERIES["r22_asof_join"](spark, SF), "simple")
    assert "Join" not in plan and "CartesianProduct" not in plan
    exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(exchanges) == 1, plan


# --- range_join --------------------------------------------------------------


def test_range_join_equals_naive_inequality_join(spark):
    ev = load_table(spark, SF, "events").select("ts", "event_id")
    anchor = 1704067200
    iv = spark.range(10).select(
        F.col("id").alias("iv_id"),
        F.timestamp_seconds(anchor + F.col("id") * 86400).alias("s"),
        F.timestamp_seconds(
            anchor + F.col("id") * 86400 + 129600  # 36h: overlapping
        ).alias("e"),
    )
    fast = J.range_join(ev, iv, "ts", "s", "e", bucket_seconds=21600)
    naive = iv.join(
        ev, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
    )
    fast_set = {(r["iv_id"], r["event_id"]) for r in fast.collect()}
    naive_set = {(r["iv_id"], r["event_id"]) for r in naive.collect()}
    assert fast_set == naive_set and len(fast_set) > 0


def test_range_join_boundary_semantics(spark):
    """start is inclusive, end is exclusive — even exactly on a bucket
    boundary."""
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00")), (2, _ts("2024-01-02 00:00:00"))],
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iv_id long, s timestamp, e timestamp",
    )
    out = J.range_join(ev, iv, "ts", "s", "e", bucket_seconds=86400)
    got = [(r["iv_id"], r["event_id"]) for r in out.collect()]
    assert got == [(7, 1)]


def test_range_join_plan_no_cartesian(spark):
    plan = plan_of(QUERIES["r23_campaign_range_join"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- rollup / pivot ----------------------------------------------------------


def test_cube_levels(spark):
    out = QUERIES["r24_cube"](spark, SF).collect()
    by_lvl = {}
    for r in out:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # all 4 grouping sets: leaf(0), per-flag(1), per-status(2), grand(3)
    assert set(by_lvl) == {0, 1, 2, 3}
    assert len(by_lvl[3]) == 1
    assert {(r["flag"], r["status"]) for r in by_lvl[3]} == {("ALL", "ALL")}
    assert all(r["status"] == "ALL" and r["flag"] != "ALL" for r in by_lvl[1])
    assert all(r["flag"] == "ALL" and r["status"] != "ALL" for r in by_lvl[2])
    assert all(
        r["flag"] != "ALL" and r["status"] != "ALL" for r in by_lvl[0]
    )
    total = by_lvl[3][0]["n_rows"]
    for lvl in (0, 1, 2):
        assert total == sum(r["n_rows"] for r in by_lvl[lvl])


def test_pivot_matches_filtered_counts(spark):
    ev = load_table(spark, SF, "events")
    wide = QUERIES["r25_pivot"](spark, SF)
    n_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id").count().collect()
    )
    expected = {r["user_id"]: r["count"] for r in n_purchase}
    got = {r["user_id"]: r["purchase_n"] for r in wide.collect()}
    for u, n in expected.items():
        assert got[u] == n
    # users with zero purchases read 0, not NULL
    assert all(v is not None for v in got.values())


# --- per-group OLS -----------------------------------------------------------


def test_linreg_recovers_exact_line(spark):
    """y = 3x + 7 exactly -> slope 3, intercept 7 from the moment form."""
    pts = spark.createDataFrame(
        [("a", x, 3 * x + 7) for x in range(10)], "g string, x long, y long"
    )
    m = pts.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = m.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("slope")
    ).first()
    assert r["slope"] == 3.0


# --- ROC-AUC -----------------------------------------------------------------


def test_auc_matches_bruteforce_pairs(spark):
    """Histogram AUC == O(P*N) pair counting (with half credit for
    ties), on the real sf0.001 scores."""
    from martech_pipelines_spark.operators.text import hashed_linear_score

    docs = load_table(spark, SF, "documents")
    scored = hashed_linear_score(docs, extra_cols=("lang",)).collect()
    pos = [r["score_milli"] for r in scored if r["lang"] == "en"]
    neg = [r["score_milli"] for r in scored if r["lang"] != "en"]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    brute = wins / (len(pos) * len(neg))
    got = QUERIES["t31_classifier_auc"](spark, SF).first()
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - brute) < 1e-6


def test_auc_plan_has_no_global_row_sort(spark):
    """The sort/window runs over the distinct-score histogram, after the
    aggregation — not over the raw doc rows (scale form)."""
    plan = plan_of(QUERIES["t31_classifier_auc"](spark, SF), "simple")
    sort_pos = plan.find("Sort")
    last_agg_pos = plan.rfind("HashAggregate")
    assert sort_pos != -1 and last_agg_pos != -1
    # simple plans print root-first: the window Sort must sit ABOVE the
    # per-score histogram aggregation (deepest HashAggregate), i.e. it
    # runs AFTER the docs have been reduced to distinct scores
    assert sort_pos < last_agg_pos, plan


# --- covariance / PCA --------------------------------------------------------


def test_covariance_arrow_equals_exact(spark):
    """Integer-exact contract: the Arrow Gram-partial twin must be
    BIT-identical to the exact form (both accumulate the same exact
    integer moments), not merely within a float tolerance."""
    emb = load_table(spark, SF, "embeddings")
    a = {
        (r["i"], r["j"]): r["cov"]
        for r in LA.embedding_covariance(emb, round_dp=5, id_col="vec_id").collect()
    }
    b = {
        (r["i"], r["j"]): r["cov"]
        for r in LA.embedding_covariance_arrow(emb, round_dp=5).collect()
    }
    assert a == b


def test_covariance_partition_invariant(spark):
    """The r5 driver hash-fail mode: double sums differing by ~1 ulp
    across summation orders near a 5-dp rounding boundary.  The
    quantized-integer contract must produce bit-identical cells for ANY
    partitioning of the input, for both forms."""
    emb = load_table(spark, SF, "embeddings")
    baseline = sorted(
        tuple(r) for r in LA.embedding_covariance(
            emb, round_dp=5, id_col="vec_id"
        ).collect()
    )
    for nparts in (1, 7, 32):
        ex = sorted(
            tuple(r) for r in LA.embedding_covariance(
                emb.repartition(nparts), round_dp=5, id_col="vec_id"
            ).collect()
        )
        ar = sorted(
            tuple(r) for r in LA.embedding_covariance_arrow(
                emb.repartition(nparts), round_dp=5
            ).collect()
        )
        assert ex == baseline, nparts
        assert ar == baseline, nparts


def test_covariance_arrow_overflow_fails_loudly(spark):
    """ADVICE r6: out-of-envelope magnitudes (the documented ~9e6-row
    headroom assumes |x|<=1) must raise OverflowError from the int64
    Gram kernel instead of silently wrapping and corrupting the
    'bit-exact' result."""
    import pytest as _pytest

    big = spark.range(4).selectExpr(
        "id AS vec_id", "array(1.0e7, -1.0e7) AS embedding"
    )
    with _pytest.raises(Exception) as exc:
        LA.embedding_covariance_arrow(big, round_dp=5).collect()
    assert "OverflowError" in str(exc.value) or "overflow" in str(exc.value)


def test_covariance_diagonal_is_variance(spark):
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype="float64")
    var0 = x[:, 0].var()  # population variance
    got = (
        LA.embedding_covariance(emb, round_dp=5, id_col="vec_id")
        .where((F.col("i") == 0) & (F.col("j") == 0))
        .first()["cov"]
    )
    assert abs(got - var0) < 1e-4


def test_pca_gates(spark):
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    mean, comps, vals = LA.pca_components(emb, k=4, id_col="vec_id")
    # orthonormal rows
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-8)
    # descending, non-negative explained variance
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(3))
    assert vals[-1] >= -1e-10
    # deterministic sign convention: largest-|coord| positive
    for r in range(4):
        assert comps[r, np.argmax(np.abs(comps[r]))] > 0
    # projection variance per component ~= eigenvalue
    proj = LA.pca_project(emb, mean, comps, round_dp=8)
    p = np.array([r["pca"] for r in proj.select("pca").collect()])
    for k in range(4):
        assert abs(p[:, k].var() - vals[k]) < 1e-3 * max(1.0, vals[k])


def test_pca_projection_is_codegen_only(spark):
    """No Python eval nodes in the projection plan (the eigendecomposition
    is driver-side; the per-row path is pure Column expressions)."""
    emb = load_table(spark, SF, "embeddings")
    mean, comps, _ = LA.pca_components(emb, k=2, id_col="vec_id")
    plan = plan_of(LA.pca_project(emb, mean, comps))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


# --- PageRank ----------------------------------------------------------------


def test_pagerank_mass_conservation_with_dangling(spark):
    """a<->b plus a->c where c has no outlinks: dangling mass must be
    redistributed so ranks still sum to 1."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src long, dst long"
    )
    ranks = G.pagerank(edges, iterations=4, damping=0.85)
    rows = {r["node"]: r["rank"] for r in ranks.collect()}
    assert set(rows) == {1, 2, 3}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    # b and c each receive exactly half of a's rank, so they tie; a
    # additionally receives ALL of b's rank, so it dominates
    assert rows[2] == pytest.approx(rows[3], abs=1e-12)
    assert rows[1] > rows[2]


def test_pagerank_uniform_on_symmetric_cycle(spark):
    """On a regular graph (directed cycle), PageRank is exactly uniform."""
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = G.pagerank(edges, iterations=5)
    for r in ranks.collect():
        assert abs(r["rank"] - 1.0 / n) < 1e-12


def test_copurchase_edges_symmetric_no_self_loops(spark):
    li = load_table(spark, SF, "lineitem")
    edges = G.copurchase_edges(li)
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    assert edges.exceptAll(rev).count() == 0  # symmetric edge set
