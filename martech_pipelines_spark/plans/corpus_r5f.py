"""Round-5f corpus additions (sixth wave of round 5).

- ``pipe7_propensity_training_set`` — the full training-set builder in
  one window pass: for every view event, strict-PAST behavioural
  features (fe1's frames) plus a strict-FUTURE 7-day purchase label.
  Past and future frames share one keyed sort, so the whole example
  table costs ONE exchange — and the value-based frame boundaries make
  both directions leakage-proof under timestamp ties.
- ``r28_cumulative_reach`` — daily new users + cumulative distinct reach
  (the DAU/reach curve): first-touch reduction per user, then a tiny
  ordered window over days.

Registers into the shared QUERIES/ORACLE dicts at import time; names are
prepended to plans/__init__._WINDOW_PRIORITY so the driver's 50-slot
correctness window verifies the newest work first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table

_WEEK_US = 7 * 86400 * 1_000_000

# =============================================================================
# pipe7: propensity training-set builder (features + forward label).
# Reference scope: §2.J north-star — the supervised-learning counterpart
# of fe1: the reference's profile exports feed exactly this kind of
# churn/propensity model upstream; here the whole example table is built
# leakage-safe inside the engine.
# =============================================================================

_PIPE7_ORACLE = f"""
    WITH base AS (
        SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(value * 100) AS BIGINT) END AS p_paise,
               CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END AS p_us
        FROM events
    ), feat AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(coalesce(sum(is_view) OVER w7, 0) AS BIGINT)
                   AS n_views_7d,
               count(p_us) OVER wp AS n_purchases_before,
               CAST(coalesce(sum(p_paise) OVER wp, 0) AS BIGINT)
                   AS spend_before_paise,
               CAST(count(p_us) OVER wf > 0 AS BOOLEAN)
                   AS will_purchase_7d
        FROM base
        WINDOW
            w7 AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN {_WEEK_US} PRECEDING AND 1 PRECEDING),
            wp AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            wf AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 1 FOLLOWING AND {_WEEK_US} FOLLOWING)
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           n_views_7d, n_purchases_before, spend_before_paise,
           will_purchase_7d
    FROM feat WHERE event_type = 'view'
"""


@q("pipe7_propensity_training_set", _PIPE7_ORACLE)
def pipe7_propensity_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One training example per view event: three strict-past features
    (fe1's trailing frames) and a strict-future label — did the user
    purchase within the NEXT 7 days?  All four window frames hang off
    the same (user_id, event-time) sort, so the entire example table is
    ONE hash exchange; RANGE (value-based) boundaries exclude the
    current instant in BOTH directions, so neither the features nor the
    label can see the example's own moment — the two classic leakage
    bugs (past leaks via tie-order, label leaks via inclusive future
    frame) are structurally impossible.  At 100 TB this shape is why
    the builder works: no per-example point lookups, no self-join of
    events to events, just a keyed sort shared by every column."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.unix_micros("ts").alias("us"),
        (F.col("event_type") == "view").cast("long").alias("is_view"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100).cast("long"),
        ).alias("p_paise"),
        F.when(
            F.col("event_type") == "purchase", F.unix_micros("ts")
        ).alias("p_us"),
    )
    order = Window.partitionBy("user_id").orderBy("us")
    w7 = order.rangeBetween(-_WEEK_US, -1)
    wp = order.rangeBetween(Window.unboundedPreceding, -1)
    wf = order.rangeBetween(1, _WEEK_US)
    feat = base.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.coalesce(F.sum("is_view").over(w7), F.lit(0)).alias("n_views_7d"),
        F.count("p_us").over(wp).alias("n_purchases_before"),
        F.coalesce(F.sum("p_paise").over(wp), F.lit(0)).alias(
            "spend_before_paise"
        ),
        (F.count("p_us").over(wf) > 0).alias("will_purchase_7d"),
    )
    return feat.where(F.col("event_type") == "view").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "n_views_7d",
        "n_purchases_before",
        "spend_before_paise",
        "will_purchase_7d",
    )


# =============================================================================
# r28: daily new users + cumulative distinct reach.
# Reference scope: §2.J fill-in — the reach curve every campaign report
# carries; exact cumulative COUNT DISTINCT without a quadratic
# re-aggregation per day.
# =============================================================================

_R28_ORACLE = """
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), flagged AS (
        SELECT day, user_id,
               min(day) OVER (PARTITION BY user_id) AS first_day
        FROM ud
    ), by_day AS (
        SELECT day,
               count(*) AS active_users,
               count(*) FILTER (WHERE day = first_day) AS new_users
        FROM flagged
        GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           active_users, new_users,
           CAST(sum(new_users) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM by_day
"""


@q("r28_cumulative_reach", _R28_ORACLE)
def r28_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reach curve, exactly: daily active users (distinct), daily NEW
    users, and cumulative distinct reach.  One reduction to distinct
    (user, day) pairs (the map-side combine does almost all the work), a
    per-user first-day window on the reduced table, one per-day count,
    then a running sum over the tiny day table.  The naive cumulative
    form — COUNT(DISTINCT) over an expanding per-day window — would
    re-deduplicate the whole prefix for every day; first-touch reduction
    makes cumulative-distinct ADDITIVE, which is also what makes it
    IVM-able (new data can only add users or move first_days earlier: a
    mergeable min — h13 is the maintained twin sharing this oracle)."""
    from martech_pipelines_spark.operators.transforms import (
        reach_curve,
        user_days_of,
    )

    ev = load_table(spark, sf_dir, "events")
    return reach_curve(user_days_of(ev))
