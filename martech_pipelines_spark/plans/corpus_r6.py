"""Round-6 corpus additions.

``g2b_triangles_support2`` — g2's triangle/clustering stats at
PRODUCTION graph density: co-purchase edges support-thresholded at 2
(a pair must co-occur in >=2 distinct orders to be an edge).  g2 keeps
the support-1 stress form deliberately — it measures exact triangle
enumeration on the densest graph the data can produce — but a 100x
deployment with a growing fact table over a fixed catalog runs the
thresholded form (see ``copurchase_edges_undirected``'s docstring for
why support-1 density inflates quadratically).  Tracking BOTH in the
headline bench pins the stress cost AND the cost a real deployment
pays (VERDICT r5 "Next round" #7).

``s15_label_centroids`` — per-label mean embedding cells under the
round-6 integer-exact contract (the determinism discipline the s12
driver failure forced, applied to the class-conditional first moment).

``h19_incremental_covariance`` — IVM twin for the covariance matrix:
per-batch integer moment frames merged with one keyed sum.  Integer
associativity makes incremental == full recompute BIT-identical, so it
shares s12's oracle — the strongest form of the h6-h18 incremental ==
full contract (those hold up to float tolerance; this holds exactly).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import graph as G
from martech_pipelines_spark.operators import linalg as LA
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_r5d import _S12_ORACLE
from martech_pipelines_spark.sources import load_table


# Same triangle/clustering oracle as g2 but the edge CTE keeps only
# pairs co-purchased in >=2 distinct orders (the deduplicated
# (order, part) projection makes support = distinct co-purchase orders,
# mirroring copurchase_edges_undirected's contract).
_G2B_ORACLE = """
    WITH lp AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), und AS (
        SELECT a.p AS a, b.p AS b
        FROM lp a JOIN lp b ON a.k = b.k AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ), deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM und
            UNION ALL
            SELECT b AS node FROM und
        ) ends GROUP BY 1
    ), tri AS (
        SELECT e1.a AS u, e1.b AS v, e2.b AS w
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ), corners AS (
        SELECT node, count(*) AS triangles FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri
        ) c GROUP BY 1
    )
    SELECT node, degree, triangles,
           round(2.0 * triangles / (degree * (degree - 1)), 6) AS clustering
    FROM corners JOIN deg USING (node)
    ORDER BY triangles DESC, node
    LIMIT 20
"""


@q("g2b_triangles_support2", _G2B_ORACLE)
def g2b_triangles_support2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g2's top-20 triangle stats on the support->=2 co-purchase graph —
    the form a growing-fact-table deployment runs.  Identical
    degree-ordered-orientation plan as g2; only the edge build changes
    (the support filter rides the pair aggregation that already
    exists, costing zero extra shuffles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return G.triangle_stats(
        G.copurchase_edges_undirected(li, min_support=2),
        top_n=20,
        undirected=True,
    )


# =============================================================================
# s15: per-label embedding centroids (integer-exact contract).
# =============================================================================

# Mirrors operators/linalg.py:embedding_label_centroids — quantize to
# floor(x*10^6 + 0.5), exact integer sum, integer half-up division at
# 6 dp.  Bit-identical across engines/partitionings by construction.
_S15_ORACLE = """
    WITH e AS (
        SELECT label,
               CAST(i AS INTEGER) - 1 AS dim,
               CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    mo AS (
        SELECT label, dim,
               sum(CAST(xq AS HUGEINT)) * 1000000 AS num,
               CAST(count(*) AS HUGEINT) * 1000000 AS den
        FROM e GROUP BY 1, 2
    )
    SELECT label, dim,
           CAST(CASE WHEN num >= 0 THEN (2*num + den) // (2*den)
                     ELSE -((-2*num + den) // (2*den)) END AS DOUBLE)
           / 1000000.0 AS centroid
    FROM mo
"""


@q("s15_label_centroids", _S15_ORACLE)
def s15_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding as (label, dim, centroid) cells — the
    nearest-centroid / per-class-drift statistic.  One keyed shuffle of
    n*d cells; output is labels*d rows (catalog-bound).  Integer-exact
    like the round-6 covariance: the centroid doubles are bit-identical
    under any partitioning, engine, or summation order."""
    emb = load_table(spark, sf_dir, "embeddings")
    return LA.embedding_label_centroids(
        emb, "label", "embedding", round_dp=6
    )


# =============================================================================
# h19: incremental covariance via mergeable integer moment frames.
# Shares s12's oracle: incremental == full recompute, BIT-identical.
# =============================================================================


@q("h19_incremental_covariance", _S12_ORACLE)
def h19_incremental_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance maintained incrementally over three delta batches
    (split by vec_id % 3 — not arrival-ordered, so the merge must be
    genuinely commutative): each batch reduces to a d*(d+1)/2-cell
    integer moment frame, folded into the running state with one keyed
    sum.  Integer associativity makes the final cells BIT-identical to
    s12's one-pass recompute — which is exactly what the shared oracle
    checks.  At 100 TB this is the covariance maintenance plan: the
    per-batch shuffle is d^2 cells regardless of batch size, and no
    raw history is ever re-read."""
    emb = load_table(spark, sf_dir, "embeddings")
    state = LA.covariance_moments(emb.where(F.col("vec_id") % 3 == 0))
    for r in (1, 2):
        delta = LA.covariance_moments(emb.where(F.col("vec_id") % 3 == r))
        state = LA.merge_covariance_moments(state, delta)
    return LA.covariance_from_moments(state, round_dp=5)
