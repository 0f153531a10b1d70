"""Round-5r corpus additions (wave 15 of round 5).

- ``dq7_k_anonymity`` — privacy audit: quasi-identifier groups smaller
  than k (the re-identification risk set a data-release pipeline must
  check before exporting; complements dq5's erasure audit).
- ``r31b_rolling_active_hll`` — the sketch twin of r31: rolling WAU
  from per-day HLL sketches merged over the trailing window.  The
  shuffle moves 7·|days| fixed-size sketches instead of 7·|user-days|
  rows — the form that survives a user base too large to fan out
  exactly.  Approximate, so rows-only + an error gate in pytest against
  r31's exact curve (the h7 contract).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


_DQ7_K = 8

_DQ7_ORACLE = f"""
    SELECT c_nationkey, c_mktsegment, count(*) AS group_size
    FROM customer
    GROUP BY 1, 2
    HAVING count(*) < {_DQ7_K}
"""


@q("dq7_k_anonymity", _DQ7_ORACLE)
def dq7_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-
    identifier: every group smaller than k=8 is a re-identification
    risk the release pipeline must suppress or generalize.  ONE keyed
    aggregation with map-side combine — the audit costs a single
    shuffle of |groups| rows regardless of table size; the HAVING
    filter is a post-agg predicate on the tiny group table."""
    from martech_pipelines_spark.operators.transforms import (
        k_anonymity_violations,
    )

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity_violations(
        cust, ["c_nationkey", "c_mktsegment"], k=_DQ7_K
    )


@q("r31b_rolling_active_hll")  # rows-only: HLL estimates (error-gated in pytest)
def r31b_rolling_active_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch twin of r31: per-day HLL(user) sketches, each fanned out
    to the 7 report days it covers, merged with ``hll_union_agg`` per
    day, estimated.  At 100 TB this is the survivable form: the
    windowed shuffle carries 7·|days| fixed-size (2^lgk-byte) sketches,
    independent of user count, where r31's exact fan-out carries
    7·|user-days| rows.  The per-day sketch table is also the IVM
    state: a late batch re-aggregates into its day's sketch via one
    keyed union (h7's mergeable-distinct contract).  Accuracy is pinned
    in pytest: every day's estimate within 5% of r31's exact curve."""
    from martech_pipelines_spark.operators.transforms import (
        rolling_active_hll,
    )

    ev = load_table(spark, sf_dir, "events")
    return rolling_active_hll(ev, window_days=7)
