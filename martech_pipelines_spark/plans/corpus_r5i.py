"""Round-5i corpus additions (eighth wave of round 5).

- ``h14_incremental_scd2`` — IVM proof for the type-2 dimension: the
  SCD2 table maintained across three time-split change batches with
  ``cdc.scd2_apply_changes`` (close-open-rows + append-new-versions),
  checked against mart4's FULL-rebuild oracle verbatim.
- ``mart12_top_paths`` — session path analysis: the ordered event-type
  journey per (user, day) session, top paths by frequency with
  conversion counts (the funnel's free-form cousin).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import cdc
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_r4 import _MART4_ORACLE
from martech_pipelines_spark.sources import load_table


# =============================================================================
# h14: incrementally-maintained SCD2 (shares mart4's full-rebuild oracle).
# Reference scope: the reference's CDC pipelines append change batches
# forever (tasks/user_profile/clevertap.py watermark loop); a type-2
# dimension that required a full-history rebuild per batch would be
# unusable at 100 TB — this is the maintenance path, value-checked
# against the rebuild.
# =============================================================================


@q("h14_incremental_scd2", _MART4_ORACLE)
def h14_incremental_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the dimension from the first third of the change log, then
    fold in two later time-split batches with ``scd2_apply_changes``:
    each fold closes the affected keys' open versions at their first new
    timestamp and appends the batch's own version rows — history is
    never rescanned.  The oracle is mart4's FULL rebuild over the whole
    log, so open/close boundaries, is_current flags and the end-of-time
    sentinel must all come out identical to a from-scratch build."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    # Integer-micros splits (2024-01-11 / 2024-01-21 UTC; tz-proof — the
    # SCD2 fold is split-invariant, but no literal parse survives in the
    # corpus after the r7 fe2 incident).
    cut1_us, cut2_us = 1704931200000000, 1705795200000000
    b0 = ev.where(F.unix_micros("ts") < F.lit(cut1_us))
    b1 = ev.where(
        (F.unix_micros("ts") >= F.lit(cut1_us))
        & (F.unix_micros("ts") < F.lit(cut2_us))
    )
    b2 = ev.where(F.unix_micros("ts") >= F.lit(cut2_us))
    dim = cdc.scd2_from_changes(b0, "user_id", "ts", tiebreak_cols=["event_id"])
    dim = cdc.scd2_apply_changes(dim, b1, "user_id", "ts", ["event_id"])
    dim = cdc.scd2_apply_changes(dim, b2, "user_id", "ts", ["event_id"])
    return dim.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


# =============================================================================
# mart12: top session paths (journey analysis).
# Reference scope: §2.J north-star — mart9's Markov transitions are the
# 1-step summary; this keeps the whole ordered journey per session and
# ranks the most-travelled paths with their conversion counts.
# =============================================================================

_MART12_TOPN = 20

_MART12_ORACLE = f"""
    WITH paths AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY 1, 2
    ), counted AS (
        SELECT path,
               count(*) AS n_sessions,
               count(*) FILTER (WHERE path LIKE '%purchase%')
                   AS n_converting
        FROM paths GROUP BY 1
    )
    SELECT path, n_sessions, n_converting
    FROM counted
    ORDER BY n_sessions DESC, path
    LIMIT {_MART12_TOPN}
"""


@q("mart12_top_paths", _MART12_ORACLE)
def mart12_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most-travelled session journeys: each (user, day) session's
    events concatenated in time order into a path string, counted, with
    how many of those sessions converted.  Ordering inside a path is
    made deterministic the distributed way: ``collect_list`` of (ts,
    event_id, type) structs + ``array_sort`` — collect_list alone has NO
    order guarantee across partitions and would be flaky under AQE; the
    struct sort pins (ts, event_id) totally.  One session-keyed shuffle
    (fan-in bounded by session length), one path-keyed count, integer
    top-N with a path tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(
        F.count("*").alias("n_sessions"),
        F.count(F.when(F.col("path").contains("purchase"), 1)).alias(
            "n_converting"
        ),
    )
    return counted.orderBy(F.desc("n_sessions"), F.asc("path")).limit(
        _MART12_TOPN
    )
