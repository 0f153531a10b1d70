"""Round-5o corpus additions (wave 13 of round 5).

- ``mart14_funnel`` — the ordered view -> click -> purchase conversion
  funnel: first-touch greedy min-chain computed in ONE keyed shuffle
  via an ``F.aggregate`` fold over per-user time-sorted event arrays
  (the k-self-join oracle form shuffles the fact table k times; the
  engine form shuffles it once).
- ``mart15_retention`` — the weekly cohort retention triangle over the
  distinct (week, user) activity state, no COUNT(DISTINCT) anywhere.
- ``h16_incremental_retention`` — IVM proof for the triangle: the
  (week, user) state folded over three out-of-order delta batches with
  an idempotent distinct-merge, read through the same matrix builder,
  checked against mart15's FULL-recompute oracle.

Reference scope: §2.J north-star marts — the reference exports user
profiles to campaign tools (tasks/user_profile/clevertap.py); funnel
conversion and cohort retention are the canonical reports run over the
same event stream before deciding WHO to export.

Registers into the shared QUERIES/ORACLE dicts at import time; names are
prepended to plans/__init__._WINDOW_PRIORITY so the driver's 50-slot
correctness window verifies the newest work first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import graph as G
from martech_pipelines_spark.operators.transforms import (
    merge_user_weeks,
    ordered_funnel,
    retention_matrix,
    user_weeks_of,
)
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


# =============================================================================
# mart14: ordered conversion funnel (greedy first-touch min-chain).
# =============================================================================

_FUNNEL_STEPS = ["view", "click", "purchase"]

def _funnel_oracle(within_s: int | None = None) -> str:
    """One spelling of the greedy min-chain spec for BOTH funnel
    oracles: step i's reach time is the MIN event of that type STRICTLY
    after step i-1's reach time, optionally bounded to ``within_s``
    seconds of it.  With unbounded windows the greedy chain equals the
    existential ordered match; windowed, it is the first-touch-anchored
    convention ``ordered_funnel`` documents."""

    def win(prev: str) -> str:
        if within_s is None:
            return ""
        return f" AND e.ts <= {prev} + INTERVAL {within_s} SECOND"

    return f"""
    WITH v AS (
        SELECT user_id, min(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS ct
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.vt{win('v.vt')}
        GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS pt
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.ct{win('c.ct')}
        GROUP BY 1
    ), n AS (
        SELECT (SELECT count(*) FROM v) AS n0,
               (SELECT count(*) FROM c) AS n1,
               (SELECT count(*) FROM p) AS n2
    )
    SELECT * FROM (
        SELECT 0 AS step_idx, 'view' AS step, n0 AS users,
               1.0 AS conv_from_prev, 1.0 AS conv_from_first FROM n
        UNION ALL
        SELECT 1, 'click', n1,
               round(CAST(n1 AS DOUBLE) / nullif(n0, 0), 6),
               round(CAST(n1 AS DOUBLE) / nullif(n0, 0), 6) FROM n
        UNION ALL
        SELECT 2, 'purchase', n2,
               round(CAST(n2 AS DOUBLE) / nullif(n1, 0), 6),
               round(CAST(n2 AS DOUBLE) / nullif(n0, 0), 6) FROM n
    )
"""


_MART14_ORACLE = _funnel_oracle()


@q("mart14_funnel", _MART14_ORACLE)
def mart14_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel: per-step reach counts
    and conversion rates under first-touch greedy semantics (step i
    strictly after step i-1's reach time; see ``ordered_funnel``).

    Plan: step-type IN-filter pushed to the parquet scan, ONE user-keyed
    shuffle building time-sorted event arrays, a JVM-side
    ``F.aggregate`` fold for the chain, then a 1-row count reduction —
    vs the oracle's 3-way self-join chain which re-shuffles events once
    per step.  At 100 TB the fold form wins on shuffle volume k-fold and
    its per-user state is 3 longs."""
    ev = load_table(spark, sf_dir, "events")
    return ordered_funnel(ev, _FUNNEL_STEPS)


# =============================================================================
# mart15: weekly cohort retention triangle; h16: its IVM twin.
# =============================================================================

_MART15_ORACLE = """
    WITH uw AS (
        SELECT DISTINCT date_trunc('week', ts) AS week, user_id FROM events
    ), f AS (
        SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1
    ), cells AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, uw.week) / 7 AS INTEGER)
                   AS age_weeks,
               count(*) AS active_users
        FROM uw JOIN f USING (user_id) GROUP BY 1, 2
    ), sizes AS (
        SELECT cohort_week, active_users AS cohort_size
        FROM cells WHERE age_weeks = 0
    )
    SELECT strftime(cells.cohort_week, '%Y-%m-%d') AS cohort_week,
           age_weeks, cohort_size, active_users,
           round(CAST(active_users AS DOUBLE) / cohort_size, 6)
               AS retention_pct
    FROM cells JOIN sizes USING (cohort_week)
"""


@q("mart15_retention", _MART15_ORACLE)
def mart15_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: share of each first-week cohort
    still active at age 0..N weeks.  The event stream reduces to
    distinct (week, user) pairs FIRST (map-side combine), so the
    windowed cohort pin and the cell agg run over |users|x|weeks| rows,
    not raw events, and cohort sizes are the age-0 cells re-read (no
    COUNT(DISTINCT)).  Complements mart7 (revenue per cohort cell) with
    the activity-share triangle every growth report starts from."""
    ev = load_table(spark, sf_dir, "events")
    return retention_matrix(user_weeks_of(ev))


@q("h16_incremental_retention", _MART15_ORACLE)  # SHARES mart15's oracle
def h16_incremental_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM proof for the retention triangle: the (week, user) activity
    state folded over three delta batches split by event_id — NOT
    time-ordered, so late data lands in old weeks and must still merge
    correctly — then read through the same ``retention_matrix``.  The
    oracle is mart15's full recompute, so incremental == full is
    engine-checked.  Cohort week is a mergeable min READ AT QUERY TIME
    (never frozen into the state), which is what makes late arrivals
    free: a batch revealing an earlier first-week simply re-pins the
    user's cohort on the next read."""
    ev = load_table(spark, sf_dir, "events")
    state = user_weeks_of(ev.where(F.col("event_id") % 3 == 0))
    state = merge_user_weeks(state, ev.where(F.col("event_id") % 3 == 1))
    state = merge_user_weeks(state, ev.where(F.col("event_id") % 3 == 2))
    return retention_matrix(state)


# =============================================================================
# w6: windowed funnel (greedy, anchored at first touch, 48h per step).
# =============================================================================

_W6_WITHIN_S = 48 * 3600

_W6_ORACLE = _funnel_oracle(_W6_WITHIN_S)


@q("w6_windowed_funnel", _W6_ORACLE)
def w6_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart14's funnel with a 48-hour window per step: each step must
    land within 48h of the previous step's reach time (strictly after,
    boundary inclusive, integer-microsecond arithmetic in both engines).
    GREEDY ANCHORED AT FIRST TOUCH — the product-analytics convention;
    see ``ordered_funnel`` for why the existential-anchor search is not
    what any funnel tool computes.  Same single-shuffle fold plan as
    mart14; the oracle spells the identical greedy chain with interval
    arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    return ordered_funnel(ev, _FUNNEL_STEPS, within_s=_W6_WITHIN_S)


# =============================================================================
# g2: triangle counting + local clustering coefficient (degree-ordered
# orientation) over the co-purchase graph.
# =============================================================================

_G2_ORACLE = """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey <> b.l_partkey
    ), und AS (
        SELECT src AS a, dst AS b FROM e WHERE src < dst
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


@q("g2_triangles", _G2_ORACLE)
def g2_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchase parts by triangle participation, with degree
    and local clustering coefficient — the cohesion metric behind
    "bought together" bundle detection.  The engine enumerates via
    degree-ordered orientation (per-node out-degree O(sqrt(m)) — hub-
    proof wedge join); the oracle enumerates id-ordered.  Triangle
    counts are orientation-invariant, so the two agree exactly; the
    (triangles DESC, node ASC) order is total, so the top-20 cut is
    engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    return G.triangle_stats(
        G.copurchase_edges_undirected(li), top_n=20, undirected=True
    )
