"""Round-5l corpus additions (tenth wave of round 5).

- ``dq5_erasure_audit`` — right-to-be-forgotten scrub with a compliance
  audit: erase a deterministic deletion list from events via broadcast
  anti-join, emit the (before, after, removed, leftover) audit row —
  leftover MUST be zero.
- ``pipe9_campaign_report`` — the composed campaign-performance report:
  range-join events into overlapping campaign windows (r23's bucketed
  interval join), then per-campaign funnel counts, DECIMAL-free integer
  revenue, reach, and conversion rate in one aggregation.

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import joins as J
from martech_pipelines_spark.operators.transforms import (
    erase_keys,
    erasure_audit,
)
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


# =============================================================================
# dq5: GDPR-style erasure + audit.
# Reference scope: the reference ships user profiles to third parties
# (tasks/user_profile exports) — the deletion path is the legal
# counterpart of the export path, and the audit row is what the
# compliance log keeps.
# =============================================================================

_DQ5_ORACLE = """
    WITH ids AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ), before AS (
        SELECT count(*) AS rows_before FROM events
    ), after AS (
        SELECT count(*) AS rows_after FROM events
        WHERE user_id NOT IN (SELECT user_id FROM ids)
    )
    SELECT 'events' AS table_name,
           rows_before,
           rows_after,
           rows_before - rows_after AS rows_removed,
           CAST(0 AS BIGINT) AS leftover_rows
    FROM before, after
"""


@q("dq5_erasure_audit", _DQ5_ORACLE)
def dq5_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase every user in the (deterministic) deletion list from the
    event log and emit the compliance audit row.  The scrub is ONE scan
    with a broadcast anti-join probe (deletion lists are tiny next to
    the data; at millions of ids, Bloom-prefilter first — dd13); the
    audit's leftover check re-probes the cleaned table with a semi-join
    and must find nothing.  The oracle computes leftover as a literal 0
    — the driver's value-hash therefore FAILS if the engine ever leaves
    an erased key behind, making the compliance property itself part of
    the correctness gate."""
    ev = load_table(spark, sf_dir, "events")
    ids = ev.where(F.col("user_id") % 97 == 0).select("user_id").distinct()
    cleaned = erase_keys(ev, ids, "user_id")
    return erasure_audit(ev, cleaned, ids, "user_id", "events")


# =============================================================================
# pipe9: composed campaign performance report.
# =============================================================================

_PIPE9_ORACLE = """
    WITH c AS (
        SELECT i AS campaign_id,
               TIMESTAMP '2024-01-01' + INTERVAL 18 HOUR * i AS start_ts,
               TIMESTAMP '2024-01-01' + INTERVAL 18 HOUR * i
                   + INTERVAL 12 HOUR * ((i % 3) + 1) AS end_ts
        FROM (SELECT unnest(range(40)) AS i)
    ), m AS (
        SELECT c.campaign_id,
               count(*) AS n_events,
               count(DISTINCT e.user_id) AS reach,
               count(*) FILTER (WHERE e.event_type = 'view') AS views,
               count(*) FILTER (WHERE e.event_type = 'click') AS clicks,
               count(*) FILTER (WHERE e.event_type = 'purchase')
                   AS purchases,
               CAST(coalesce(sum(CAST(floor(e.value * 100) AS BIGINT))
                   FILTER (WHERE e.event_type = 'purchase'), 0) AS BIGINT)
                   AS revenue_paise
        FROM c JOIN events e
          ON e.ts >= c.start_ts AND e.ts < c.end_ts
        GROUP BY 1
    )
    SELECT campaign_id, n_events, reach, views, clicks, purchases,
           revenue_paise,
           round(CAST(purchases AS DOUBLE) / n_events, 6) AS conv_rate
    FROM m
"""


@q("pipe9_campaign_report", _PIPE9_ORACLE)
def pipe9_campaign_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The campaign dashboard in one pipeline: events matched into the
    40 overlapping campaign windows by the bucketed range join (never a
    cartesian), then ONE aggregation per campaign produces the funnel
    counts (views/clicks/purchases), distinct reach, integer-paise
    revenue, and conversion rate.  Composition of r23's join machinery
    with the conditional-aggregate reporting pattern — what a reference
    user's nightly campaign report actually runs."""
    anchor = 1704067200  # 2024-01-01 00:00:00 UTC
    camp = spark.range(40).select(
        F.col("id").alias("campaign_id"),
        F.timestamp_seconds(anchor + F.col("id") * 64800).alias("start_ts"),
        F.timestamp_seconds(
            anchor + F.col("id") * 64800 + ((F.col("id") % 3) + 1) * 43200
        ).alias("end_ts"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_type", "value"
    )
    matched = J.range_join(
        ev, camp, "ts", "start_ts", "end_ts", bucket_seconds=43200
    )
    is_p = F.col("event_type") == "purchase"
    m = matched.groupBy("campaign_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("reach"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(is_p, 1)).alias("purchases"),
        F.coalesce(
            F.sum(F.when(is_p, F.floor(F.col("value") * 100).cast("long"))),
            F.lit(0),
        ).alias("revenue_paise"),
    )
    return m.select(
        "*",
        F.round(
            F.col("purchases").cast("double") / F.col("n_events"), 6
        ).alias("conv_rate"),
    )
