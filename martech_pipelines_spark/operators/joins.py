"""Temporal join operators Spark's join syntax lacks as primitives.

Two classic operators every event-analytics engine grows sooner or later,
built here as shuffle-disciplined compositions of DataFrame ops (SURVEY.md
§2.J extension surface — the reference's event pipelines join change logs
to profiles by recency, e.g. martech_pipelines/tasks/user_profile/
clevertap.py:30-53 keeps the latest row per key; ``asof_join`` is the
two-table generalisation of that same latest-before semantics):

- ``asof_join`` — for each left row, the single most recent right row with
  ``right.ts <= left.ts`` on the same key (optionally within a tolerance).
  Implemented JOIN-FREE: union both sides, one carry-forward window per
  key, keep left rows.  One keyed shuffle, no per-key fan-out join — the
  skew-proof formulation (a user with 1M right rows never materialises
  1M x matches candidate pairs, unlike the naive join+rank form).
- ``range_join`` — events matched into [start, end) intervals.  Spark has
  no interval-join primitive; the naive formulation is a cartesian with an
  inequality filter.  We bucket time at a caller-chosen granularity:
  intervals explode to the buckets they overlap (``F.sequence``), events
  key to their single containing bucket, and the match becomes an
  EQUI-join on (bucket [, keys...]) followed by the exact range predicate.
  Each event falls in exactly one bucket and each interval lists a bucket
  once, so no post-join dedup is needed.  At 100 TB the bucket width is
  the knob: ~p99 interval length keeps the per-interval explode factor
  small while the equi-join shuffles on a high-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    *,
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right row with ``right_ts <= left_ts``.

    Returns every left row (left outer semantics) plus, for each, the
    payload columns of the single most recent matching right row — or
    NULLs when no right row precedes it (or the match is older than
    ``tolerance``, an interval Column like ``F.expr("INTERVAL 72 HOURS")``).

    Ties are broken deterministically: a right row at exactly ``left_ts``
    matches (inclusive), and among right rows sharing a timestamp the one
    ordered last by ``right_payload[0]`` wins — callers should pass a
    unique id first.

    Plan shape: ONE Exchange (hashpartitioning on ``on``) feeding a single
    carry-forward window; zero join nodes.  Matches DuckDB's
    ``ASOF JOIN`` semantics (the oracle spells the same union+window form
    in ANSI SQL so any engine can replay it).
    """
    # Align schemas for the union: key cols + ts + right payload struct +
    # all left columns (null on right-side rows).
    lcols = left.columns
    r_side = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__match_ts"),
            *[F.col(c) for c in right_payload],
        ).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
    )
    l_side = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_side.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in lcols if c not in on],
    )
    # Right rows sort BEFORE left rows at an equal timestamp -> inclusive
    # (<=) semantics; the struct itself is the final tiebreak so equal-ts
    # right rows resolve deterministically (max payload wins via ordering).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r_side.unionByName(l_side)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    match = F.col("__m")
    if tolerance is not None:
        match = F.when(
            F.col("__m.__match_ts") >= F.col("__ts") - tolerance, F.col("__m")
        )
    out = carried.select(
        *[F.col(c) for c in on],
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        match.getField("__match_ts").alias(right_ts + suffix),
        *[match.getField(c).alias(c + suffix) for c in right_payload],
    )
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    *,
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-direction as-of join: for each left row, the right row
    whose timestamp is CLOSEST in either direction (pandas
    ``merge_asof(direction="nearest")``).

    Same join-free shape as ``asof_join``: one union, ONE hash exchange
    on ``on``, one sort feeding TWO window frames over the identical
    ordering (backward carry ``last IGNORE NULLS`` + forward carry
    ``first IGNORE NULLS``) — no per-key fan-out join, skew-proof.

    Deterministic tie rules (mirrored verbatim in the SQL oracle):
    - equal backward/forward distance -> BACKWARD wins;
    - a right row AT the left timestamp is a distance-0 backward match
      (inclusive), so forward effectively means strictly-after;
    - multiple right rows at one timestamp: backward keeps the one
      ordered LAST by payload (pass a unique id first), forward the one
      ordered FIRST — both artifacts of the single shared sort order.
    - ``tolerance`` (interval Column) bounds the chosen match's
      distance; beyond it the left row gets NULLs.
    """
    lcols = left.columns
    r_side = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__match_ts"),
            *[F.col(c) for c in right_payload],
        ).alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
    )
    l_side = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_side.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in lcols if c not in on],
    )
    order = [F.col("__ts"), F.col("__side"), F.col("__r")]
    w_back = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = (
        r_side.unionByName(l_side)
        .withColumn("__mb", F.last("__r", ignorenulls=True).over(w_back))
        .withColumn("__mf", F.first("__r", ignorenulls=True).over(w_fwd))
        .filter(F.col("__side") == 1)
    )
    db = F.col("__ts") - F.col("__mb.__match_ts")
    df_ = F.col("__mf.__match_ts") - F.col("__ts")
    chosen = (
        F.when(F.col("__mb").isNull(), F.col("__mf"))
        .when(F.col("__mf").isNull(), F.col("__mb"))
        .when(db <= df_, F.col("__mb"))
        .otherwise(F.col("__mf"))
    )
    carried = carried.withColumn("__m", chosen)
    match = F.col("__m")
    if tolerance is not None:
        dist = F.when(
            F.col("__m.__match_ts") <= F.col("__ts"),
            F.col("__ts") - F.col("__m.__match_ts"),
        ).otherwise(F.col("__m.__match_ts") - F.col("__ts"))
        match = F.when(dist <= tolerance, F.col("__m"))
    return carried.select(
        *[F.col(c) for c in on],
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        match.getField("__match_ts").alias(right_ts + suffix),
        *[match.getField(c).alias(c + suffix) for c in right_payload],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start: str,
    end: str,
    *,
    bucket_seconds: int = 86400,
    keys: list[str] | None = None,
) -> DataFrame:
    """Match events into half-open [start, end) intervals without a
    cartesian product.

    ``bucket_seconds`` is the time-bucket width.  Intervals explode to
    every bucket they overlap; events compute their single containing
    bucket; the match becomes an equi-join on bucket (+ ``keys``) with
    the exact ``start <= ts < end`` predicate applied after.  The result
    carries all interval columns plus all event columns.

    No dedup pass: an event lives in exactly one bucket, and
    ``F.sequence`` lists each overlapped bucket once per interval, so a
    (interval, event) pair can match at most once.
    """
    keys = keys or []
    # All bucket arithmetic in integer MICROseconds: unix_timestamp()
    # truncates fractional seconds, which would drop the final bucket of
    # an interval whose end carries sub-second precision (events in
    # [floor_sec(end), end) would silently never match).
    step_us = int(bucket_seconds) * 1_000_000
    ev = events.withColumn(
        "__bucket",
        F.floor(F.unix_micros(F.col(event_ts)) / step_us).cast("long"),
    )
    # Buckets the interval [start, end) overlaps: floor(start) ..
    # floor(end - 1us) — the half-open end does not reach into a bucket
    # it only touches at its exact boundary.
    first_b = F.floor(F.unix_micros(F.col(start)) / step_us).cast("long")
    last_b = F.floor(
        (F.unix_micros(F.col(end)) - 1) / step_us
    ).cast("long")
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(first_b, last_b))
    )
    cond = [ev["__bucket"] == iv["__bucket"]] + [
        ev[k] == iv[k] for k in keys
    ]
    joined = (
        iv.join(ev, cond, "inner")
        .filter(
            (F.col(event_ts) >= F.col(start)) & (F.col(event_ts) < F.col(end))
        )
        .drop("__bucket")
    )
    if keys:
        # drop the duplicated key columns from the event side
        for k in keys:
            joined = joined.drop(ev[k])
    return joined
