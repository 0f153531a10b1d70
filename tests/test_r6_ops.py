"""Round-6 operator tests: integer-exact linalg extensions (label
centroids, mergeable covariance moments) and the support-thresholded
triangle twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import graph as G
from martech_pipelines_spark.operators import linalg as LA
from martech_pipelines_spark.plans import QUERIES
from martech_pipelines_spark.sources import load_table

SF = "/root/testdata/sf0.01"


# --- label centroids ---------------------------------------------------------


def test_label_centroids_match_numpy_mean(spark):
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    got = {
        (r["label"], r["dim"]): r["centroid"]
        for r in LA.embedding_label_centroids(emb).collect()
    }
    for label, vecs in by_label.items():
        mean = np.asarray(vecs, dtype="float64").mean(axis=0)
        for d in range(len(mean)):
            # quantization moves each value by <= 5e-7, so the mean by
            # <= 5e-7 too; rounding at 6 dp adds <= 5e-7
            assert abs(got[(label, d)] - mean[d]) < 2e-6, (label, d)


def test_label_centroids_partition_invariant(spark):
    emb = load_table(spark, SF, "embeddings")
    baseline = sorted(
        tuple(r) for r in LA.embedding_label_centroids(emb).collect()
    )
    for nparts in (1, 7):
        got = sorted(
            tuple(r)
            for r in LA.embedding_label_centroids(
                emb.repartition(nparts)
            ).collect()
        )
        assert got == baseline, nparts


# --- mergeable covariance moments (h19) --------------------------------------


def test_incremental_covariance_bit_equals_full(spark):
    """The h19 pitch: merged per-batch integer moments render cells
    BIT-identical to the one-pass s12 computation — not merely within
    tolerance."""
    full = sorted(tuple(r) for r in QUERIES["s12_covariance"](spark, SF).collect())
    inc = sorted(
        tuple(r) for r in QUERIES["h19_incremental_covariance"](spark, SF).collect()
    )
    assert inc == full


def test_moment_merge_is_order_insensitive(spark):
    """Folding batches in a different order produces the same state —
    the commutativity a non-arrival-ordered delta stream requires."""
    emb = load_table(spark, SF, "embeddings")
    batches = [
        LA.covariance_moments(emb.where(F.col("vec_id") % 3 == r))
        for r in range(3)
    ]
    fwd = LA.merge_covariance_moments(
        LA.merge_covariance_moments(batches[0], batches[1]), batches[2]
    )
    rev = LA.merge_covariance_moments(
        LA.merge_covariance_moments(batches[2], batches[0]), batches[1]
    )
    a = sorted(tuple(r) for r in LA.covariance_from_moments(fwd).collect())
    b = sorted(tuple(r) for r in LA.covariance_from_moments(rev).collect())
    assert a == b


# --- support-thresholded triangles (g2b) -------------------------------------


def test_support2_graph_is_strict_subgraph(spark):
    li = load_table(spark, SF, "lineitem")
    e1 = G.copurchase_edges_undirected(li, min_support=1)
    e2 = G.copurchase_edges_undirected(li, min_support=2)
    n1, n2 = e1.count(), e2.count()
    assert 0 < n2 < n1
    # every support-2 edge exists in the support-1 set
    assert e2.join(e1, ["src", "dst"], "left_anti").count() == 0


def test_g2b_runs_and_clustering_bounded(spark):
    out = QUERIES["g2b_triangles_support2"](spark, SF).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert r["triangles"] >= 1
        assert 0.0 <= r["clustering"] <= 1.0
