"""Round-9 wave-2 corpus additions — new analysis families.

``mart23_ab_lift``    — A/B experiment readout (assignment, conversion
                        rates, lift, chi-square) with integer-exact
                        arithmetic: the experimentation surface every
                        martech stack runs next to RFM/attribution.
``h26_incremental_ab`` — the experiment readout maintained from
                        mergeable per-user state (IVM proof: two event
                        batches fold to the full-recompute answer).
``dq14_join_key_skew`` — per-key skew diagnostic on a join/shuffle key:
                        the measurement that DECIDES salting/AQE-skew
                        handling instead of guessing.

Reference parity: the reference repo (gauravkumar-ny/martech-pipelines)
computes none of these; they extend the martech-analytics and DQ
families per SURVEY.md's "beyond the reference" mandate, on the
driver-generated ``events`` table.

Determinism contract (memory: round-workflow #6/#8): half-up integer
ratios via ``div`` on both engines, DECIMAL(38,0)/HUGEINT intermediates
where a product can exceed int64, final columns CAST to BIGINT on the
oracle side (DuckDB ``//`` on HUGEINT stays HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators.text import md5_bucket32
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table

# ---------------------------------------------------------------------------
# mart23: A/B experiment readout — rates, lift, chi-square (integer-exact)
# ---------------------------------------------------------------------------

# Deterministic variant assignment: the engine's one portable hash
# primitive (md5_bucket32) over user_id, salt 'exp1' — reproducible
# across runs, engines, partitionings (the t12 split discipline applied
# to experiment bucketing, which is exactly how production assignment
# services work: hash(user, experiment) % arms).
_AB_SALT = "exp1"

_AB_ASSIGN_SQL = (
    "('0x' || substr(md5('" + _AB_SALT + ":' || CAST(user_id AS VARCHAR)), 1, 8))"
    "::BIGINT % 2"
)

# Shared oracle tail: from a per-user (variant, converted) table compute
# the 2x2 readout.  chi2_e6 = 1e6 * N*(ad-bc)^2 / (row and column margin
# product), half-up, in HUGEINT (DuckDB) / DECIMAL(38,0) (Spark) because
# (ad-bc)^2 * N * 2e6 exceeds int64 beyond toy populations.
_AB_TAIL_SQL = """
    agg AS (
        SELECT
            CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
            CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
            CAST(sum(CASE WHEN variant = 0 AND converted THEN 1 ELSE 0 END)
                 AS BIGINT) AS conv_c,
            CAST(sum(CASE WHEN variant = 1 AND converted THEN 1 ELSE 0 END)
                 AS BIGINT) AS conv_t
        FROM state
    )
    SELECT n_c, n_t, conv_c, conv_t,
           CAST((conv_c * 2000000 + n_c) // (2 * n_c) AS BIGINT) AS rate_c_e6,
           CAST((conv_t * 2000000 + n_t) // (2 * n_t) AS BIGINT) AS rate_t_e6,
           CAST((conv_t * 2000000 + n_t) // (2 * n_t)
                - (conv_c * 2000000 + n_c) // (2 * n_c) AS BIGINT) AS lift_e6,
           CAST(CASE WHEN n_c > 0 AND n_t > 0
                      AND (conv_c + conv_t) > 0
                      AND (n_c + n_t - conv_c - conv_t) > 0 THEN
               (2000000 * CAST(n_c + n_t AS HUGEINT)
                * CAST(conv_t * (n_c - conv_c)
                       - conv_c * (n_t - conv_t) AS HUGEINT)
                * CAST(conv_t * (n_c - conv_c)
                       - conv_c * (n_t - conv_t) AS HUGEINT)
                + CAST(n_t AS HUGEINT) * CAST(n_c AS HUGEINT)
                  * CAST(conv_c + conv_t AS HUGEINT)
                  * CAST(n_c + n_t - conv_c - conv_t AS HUGEINT))
               // (2 * CAST(n_t AS HUGEINT) * CAST(n_c AS HUGEINT)
                   * CAST(conv_c + conv_t AS HUGEINT)
                   * CAST(n_c + n_t - conv_c - conv_t AS HUGEINT))
           END AS BIGINT) AS chi2_e6
    FROM agg
"""

_MART23_ORACLE = f"""
    WITH state AS (
        SELECT user_id,
               {_AB_ASSIGN_SQL} AS variant,
               bool_or(event_type = 'purchase') AS converted
        FROM events GROUP BY 1, 2
    ),
    {_AB_TAIL_SQL}
"""


def _ab_user_state(events: DataFrame) -> DataFrame:
    """Mergeable per-user experiment state from an event batch: just the
    OR-mergeable converted flag — the variant is a pure function of the
    key and is re-derived at read, so it can never drift between
    batches."""
    return events.groupBy("user_id").agg(
        F.max(F.col("event_type") == "purchase").alias("converted"),
    )


def _ab_merge_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two per-user state tables: converted ORs."""
    return (
        a.unionByName(b)
        .groupBy("user_id")
        .agg(F.max("converted").alias("converted"))
    )


def _ab_readout(state: DataFrame) -> DataFrame:
    """The 2x2 experiment readout from per-user (variant, converted)
    state: arm sizes, conversions, half-up e6 rates, lift, and the
    chi-square statistic scaled e6.

    chi2 = N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) is exact integer
    arithmetic; the numerator reaches ~1e22 at sf0.1 so both engines
    compute it in wide integers (DECIMAL(38,0) here, HUGEINT in the
    oracle — the h23/mart21 recipe) and `div` (floor on non-negatives;
    the +den makes it half-up) keeps rounding identical.  At extreme
    populations (margins beyond ~1e6 users) DECIMAL(38,0) would
    overflow — there the statistic itself belongs in doubles computed
    FROM these exact counts; the counts/rates path is int64-safe to
    9e18 events either way."""
    variant = (md5_bucket32(F.col("user_id").cast("string"), _AB_SALT) % 2).cast(
        "long"
    )
    state = state.withColumn("variant", variant)
    agg = state.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_c"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when((F.col("variant") == 0) & F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("conv_c"),
        F.sum(F.when((F.col("variant") == 1) & F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("conv_t"),
    )
    rate_c = F.expr("(conv_c * CAST(2000000 AS BIGINT) + n_c) div (2 * n_c)")
    rate_t = F.expr("(conv_t * CAST(2000000 AS BIGINT) + n_t) div (2 * n_t)")
    d38 = "decimal(38,0)"
    chi2 = F.expr(
        f"""
        CASE WHEN n_c > 0 AND n_t > 0 AND (conv_c + conv_t) > 0
                  AND (n_c + n_t - conv_c - conv_t) > 0 THEN
            (CAST(2000000 AS {d38}) * CAST(n_c + n_t AS {d38})
             * CAST(conv_t * (n_c - conv_c) - conv_c * (n_t - conv_t) AS {d38})
             * CAST(conv_t * (n_c - conv_c) - conv_c * (n_t - conv_t) AS {d38})
             + CAST(n_t AS {d38}) * CAST(n_c AS {d38})
               * CAST(conv_c + conv_t AS {d38})
               * CAST(n_c + n_t - conv_c - conv_t AS {d38}))
            div (2 * CAST(n_t AS {d38}) * CAST(n_c AS {d38})
                 * CAST(conv_c + conv_t AS {d38})
                 * CAST(n_c + n_t - conv_c - conv_t AS {d38}))
        END
        """
    )
    return agg.select(
        "n_c",
        "n_t",
        "conv_c",
        "conv_t",
        rate_c.cast("long").alias("rate_c_e6"),
        rate_t.cast("long").alias("rate_t_e6"),
        (rate_t - rate_c).cast("long").alias("lift_e6"),
        chi2.cast("long").alias("chi2_e6"),
    )


@q("mart23_ab_lift", _MART23_ORACLE)
def mart23_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — the experimentation analysis every
    martech stack runs beside RFM (mart22) and attribution (mart5/8):
    users assigned to arms by the portable md5 primitive (exactly how
    production assignment services bucket: hash(user, experiment) %
    arms — reproducible across engines and partitionings), conversion
    = any purchase event, and the 2x2 readout with half-up e6 rates,
    lift, and the chi-square independence statistic — the entire
    statistic exact-integer (DECIMAL(38,0)/HUGEINT) so both engines
    agree bit-for-bit, no float variance anywhere.  Scale shape: one
    map-side-combined per-user agg (the only shuffle is by user_id),
    then a single 1-row global fold — the same cost as a count(*)."""
    ev = load_table(spark, sf_dir, "events")
    return _ab_readout(_ab_user_state(ev))


# Split point for the IVM twin (an integer-micros constant, never a
# timestamp literal parsed through a session timezone — memory hinge b).
_H26_CUT_US = 1705276800000000  # 2024-01-15T00:00:00Z


@q("h26_incremental_ab", _MART23_ORACLE)
def h26_incremental_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart23's IVM proof: the experiment readout maintained from
    MERGEABLE per-user state.  The event log is split at an integer-
    micros cut into two batches (the nightly-delta shape); each batch
    reduces to per-user (variant, converted) state — variant a pure
    function of the key, converted OR-mergeable — and the fold of the
    two states must reproduce the full-recompute readout bit-for-bit
    (SHARES mart23's oracle).  This is how a live experiment dashboard
    stays current: each delta batch shuffles only its own users' rows,
    history is never re-scanned."""
    ev = load_table(spark, sf_dir, "events")
    early = ev.where(F.unix_micros("ts") < F.lit(_H26_CUT_US))
    late = ev.where(F.unix_micros("ts") >= F.lit(_H26_CUT_US))
    state = _ab_merge_state(_ab_user_state(late), _ab_user_state(early))
    return _ab_readout(state)


# ---------------------------------------------------------------------------
# dq14: join/shuffle-key skew diagnostic — the salting-decision report
# ---------------------------------------------------------------------------

_DQ14_TOP = 5

_DQ14_ORACLE = f"""
    WITH per_key AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM per_key
    ), ranked AS (
        SELECT user_id, cnt,
               row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk
        FROM per_key
    )
    SELECT rnk, user_id, cnt, n_rows, n_keys,
           CAST((cnt * 2000000 + n_rows) // (2 * n_rows) AS BIGINT) AS share_e6,
           CAST((CAST(cnt AS HUGEINT) * CAST(n_keys AS HUGEINT) * 20000
                 + CAST(n_rows AS HUGEINT))
                // (2 * CAST(n_rows AS HUGEINT)) AS BIGINT) AS over_mean_e4
    FROM ranked, tot
    WHERE rnk <= {_DQ14_TOP}
"""


@q("dq14_join_key_skew", _DQ14_ORACLE)
def dq14_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic on the event stream's join key
    (user_id): the top-{_DQ14_TOP} heaviest keys with their half-up e6
    row share and their multiple of the mean per-key load (half-up e4)
    — the report that DECIDES whether a key needs salting
    (flagship_cdc_dedup_skew), AQE skew-join (dd8b), or nothing, and
    that monitors whether one whale user is about to make every
    downstream groupBy lopsided.  Scale shape: one map-side-combined
    per-key count, a 1-row totals broadcast, and a TakeOrdered top-k
    (sort+limit fuses to TakeOrderedAndProject: per-partition heaps,
    no global sort shuffle); the unique key makes the cutoff tie-free.
    The over-mean product routes through DECIMAL(38,0)/HUGEINT —
    rows x keys exceeds int64 exactly on the clusters that need this
    report most."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("cnt"))
    tot = per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    top = per_key.orderBy(F.desc("cnt"), F.asc("user_id")).limit(_DQ14_TOP)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("user_id"))),
    )
    d38 = "decimal(38,0)"
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "user_id",
            "cnt",
            "n_rows",
            "n_keys",
            F.expr("(cnt * CAST(2000000 AS BIGINT) + n_rows) div (2 * n_rows)")
            .cast("long")
            .alias("share_e6"),
            F.expr(
                f"(CAST(cnt AS {d38}) * CAST(n_keys AS {d38}) * 20000"
                f" + CAST(n_rows AS {d38})) div (2 * CAST(n_rows AS {d38}))"
            )
            .cast("long")
            .alias("over_mean_e4"),
        )
    )
