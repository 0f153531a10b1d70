"""Round-5p corpus additions (wave 14 of round 5).

- ``r31_rolling_active`` — exact trailing-7-day active users per day
  (rolling WAU), computed by bounded fan-out over the reduced
  (day, user) state instead of a per-day expanding COUNT(DISTINCT):
  shuffled volume is 7·|user-days| regardless of raw event count.

Reference scope: §2.J north-star growth analytics over the same event
stream the reference's export jobs consume.

Registers into the shared QUERIES/ORACLE dicts at import time; names are
prepended to plans/__init__._WINDOW_PRIORITY so the driver's 50-slot
correctness window verifies the newest work first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from martech_pipelines_spark.operators.transforms import rolling_active_users
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


_R31_ORACLE = """
    WITH ud AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM ud
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT u.user_id) AS active_users
    FROM days d
    JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
"""


@q("r31_rolling_active", _R31_ORACLE)
def r31_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day active users for every activity day.  The
    oracle spells the textbook per-day distinct over a 7-day range join
    — correct but quadratic in window length at scale; the engine
    reduces to distinct (day, user) first, fans each pair out to the 7
    report days it covers, and counts after one more distinct (see
    ``rolling_active_users``).  Both restrict report days to days with
    actual activity, so the sets align exactly."""
    ev = load_table(spark, sf_dir, "events")
    return rolling_active_users(ev, window_days=7)
