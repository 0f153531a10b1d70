"""Round-5g corpus additions (seventh wave of round 5).

- ``h13_incremental_reach`` — IVM proof for the reach curve: the (day,
  user) activity state folded over three delta batches with an
  idempotent distinct-merge, then read through the same curve builder —
  and the oracle is r28's FULL recompute, so incremental == full is
  engine-checked (the h6/h10/h11 pattern applied to distinct-counting).
- ``mart11_audience_overlap`` — exact audience overlap and Jaccard
  between every pair of event-type audiences; the sketch twin
  (HLL inclusion-exclusion) is error-gated in pytest.

Registers into the shared QUERIES/ORACLE dicts at import time; names are
prepended to plans/__init__._WINDOW_PRIORITY so the driver's 50-slot
correctness window verifies the newest work first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators.transforms import (
    merge_user_days,
    reach_curve,
    user_days_of,
)
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_r5f import _R28_ORACLE
from martech_pipelines_spark.sources import load_table


# =============================================================================
# h13: incrementally-maintained reach curve (shares r28's oracle).
# Reference scope: §2.J IVM north-star — distinct-counting is the
# classic "not naively additive" aggregate; the (day, user) state table
# is its mergeable form.
# =============================================================================


@q("h13_incremental_reach", _R28_ORACLE)
def h13_incremental_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain the (day, user) activity state across three delta
    batches (split by event_id, deliberately NOT time-ordered — late
    data lands in old days and must still merge correctly), then read
    the DAU/new/cumulative curve off the maintained state.  The oracle
    is the full recompute (r28's SQL verbatim), so the maintenance path
    is value-equal to batch, not just self-consistent.  Each merge
    reduces the delta to its own distinct pairs first, so the state
    table is never re-derived from raw events and replay is a no-op."""
    ev = load_table(spark, sf_dir, "events")
    state = user_days_of(ev.where(F.col("event_id") % 3 == 0))
    state = merge_user_days(state, ev.where(F.col("event_id") % 3 == 1))
    state = merge_user_days(state, ev.where(F.col("event_id") % 3 == 2))
    return reach_curve(state)


# =============================================================================
# mart11: exact audience overlap / Jaccard between event-type audiences.
# Reference scope: §2.J north-star — the audience-overlap report behind
# every segment-targeting decision; the reference exports audiences
# (tasks/user_profile exports), this measures how they intersect.
# =============================================================================

_MART11_ORACLE = """
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), tc AS (
        SELECT event_type, count(*) AS cnt FROM ut GROUP BY 1
    ), pairs AS (
        SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS overlap
        FROM ut a
        JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT t1, t2, c1.cnt AS n1, c2.cnt AS n2, overlap,
           round(CAST(overlap AS DOUBLE)
                 / (c1.cnt + c2.cnt - overlap), 6) AS jaccard
    FROM pairs
    JOIN tc c1 ON pairs.t1 = c1.event_type
    JOIN tc c2 ON pairs.t2 = c2.event_type
"""


@q("mart11_audience_overlap", _MART11_ORACLE)
def mart11_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|A ∩ B| and Jaccard for every pair of event-type audiences,
    exactly.  The self-join runs on the (user, type) DISTINCT table —
    per-user fan-out is bounded by the audience-type count (5 here), so
    pair candidates are ≤ C(5,2) per user, never |A|x|B|.  Audience
    sizes join back broadcast.  All ratios divide exact integers.  The
    sketch twin (HLL union + inclusion-exclusion, no exact state) is
    error-gated in pytest — at 100 TB you run the sketch daily and the
    exact form for audits."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("t1"))
    b = ut.select(F.col("user_id").alias("u2"), F.col("event_type").alias("t2"))
    pairs = (
        a.join(b, (a["user_id"] == b["u2"]) & (a["t1"] < b["t2"]))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("overlap"))
    )
    tc = ut.groupBy("event_type").agg(F.count("*").alias("cnt"))
    c1 = tc.select(F.col("event_type").alias("t1"), F.col("cnt").alias("n1"))
    c2 = tc.select(F.col("event_type").alias("t2"), F.col("cnt").alias("n2"))
    return (
        pairs.join(F.broadcast(c1), "t1")
        .join(F.broadcast(c2), "t2")
        .select(
            "t1",
            "t2",
            "n1",
            "n2",
            "overlap",
            F.round(
                F.col("overlap").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("overlap")),
                6,
            ).alias("jaccard"),
        )
    )
