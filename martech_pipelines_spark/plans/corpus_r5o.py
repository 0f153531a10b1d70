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

# The oracle spells the SAME greedy chain as the fold: step i's reach
# time is the MIN event of that type STRICTLY after step i-1's reach
# time.  With unbounded windows this equals the existential ordered
# match, so both engines agree on "ever did view < click < purchase".
_MART14_ORACLE = """
    WITH v AS (
        SELECT user_id, min(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS ct
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.vt GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(e.ts) AS pt
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY 1
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
