"""Round-5 corpus additions.

New queries register into the shared QUERIES/ORACLE dicts at import time,
exactly like corpus_r4.  Names added here should also be prepended to
plans/__init__._WINDOW_PRIORITY so the driver's 50-slot correctness window
verifies them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import cdc
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


# =============================================================================
# pipe5: the reference's EP2 path as ONE pipeline — CDC compaction ->
# profile export transform -> REST batch sink. The relational half (through
# the export transform) is this full-oracle corpus entry; the sink half is
# pinned end-to-end against a live local HTTP stub in
# tests/test_sinks.py::test_pipe5_export_end_to_end, which asserts the
# POSTed record count equals this query's row count.
# Reference: martech_pipelines/tasks/user_profile/clevertap.py:30-61 +
# operators/clevertap_user_profile.py:93-111 (compact -> transform -> ship).
# =============================================================================


@q(
    "pipe5_export_e2e",
    """
    WITH filtered AS (
        SELECT * FROM events WHERE event_type IN ('purchase', 'signup')
    ), ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rnk
        FROM filtered
    ), compact AS (
        SELECT user_id, event_type, value FROM ranked WHERE rnk = 1
    )
    SELECT CAST(user_id AS VARCHAR) AS identity,
           CASE WHEN length(right(CAST(9000000000 + user_id AS BIGINT)::VARCHAR, 10)) = 10
                THEN right(CAST(9000000000 + user_id AS BIGINT)::VARCHAR, 10)
           END AS phone,
           CAST(trunc(value * 100) AS BIGINT) AS value,
           event_type
    FROM compact
    WHERE user_id IS NOT NULL AND user_id <> 0
    """,
)
def pipe5_export_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship E2 compaction feeding the B4 export surface: one keyed
    shuffle (the compaction window), then a narrow codegen-only export
    stage — identity coalesce/rejection, mobile_sanity, modify_reward,
    attribute subset, rename. The sink itself (rest_batch_sink) consumes
    THIS frame partition-parallel; no extra shuffle between compact and
    ship."""
    from martech_pipelines_spark.operators.transforms import (
        ProfileExportConfig,
        profile_export_pipeline,
    )

    ev = load_table(spark, sf_dir, "events")
    compact = cdc.cdc_compact(
        ev,
        key_cols="user_id",
        ts_col="ts",
        since=None,
        change_type_col="event_type",
        pass_types=("purchase", "signup"),
        tiebreak_cols=["event_id"],
    )
    df = compact.withColumn(
        "mobile", (F.lit(9000000000) + F.col("user_id")).cast("string")
    )
    cfg = ProfileExportConfig(
        identity_fields=["user_id"],
        data_type_map={"mobile": "mobile_sanity", "value": "modify_reward"},
        attributes=["mobile", "value", "event_type"],
        swap_key_map={"mobile": "phone"},
    )
    return profile_export_pipeline(df, cfg)
