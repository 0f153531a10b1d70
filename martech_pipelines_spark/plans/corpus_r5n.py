"""Round-5n corpus additions (wave 12 of round 5).

- ``r30_debounce`` — event debouncing: collapse bursts of same-type
  events per user that arrive within a short gap of the previous kept
  event's ARRIVAL (lag-based, one window pass) — the event-pipeline
  hygiene step before attribution/funnels double-count click storms.
- ``t36_langid_confusion`` — the confusion matrix of the t3 language
  classifier against declared labels, plus per-cell share — the model
  eval that tells you WHICH languages confuse, where t31's AUC only
  scores one binary signal.

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import text as TX
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_extended import _lang_score_sql
from martech_pipelines_spark.sources import load_table


# =============================================================================
# r30: debounce (burst collapse).
# Reference scope: §2.J fill-in — the reference's counters (E4) and the
# funnels/attribution marts all assume a deduplicated click stream;
# this is the operator that makes that assumption true.
# =============================================================================

_R30_GAP_S = 60

_R30_ORACLE = f"""
    WITH lagged AS (
        SELECT event_id, user_id, event_type, ts,
               lag(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS prev_ts
        FROM events
    )
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM lagged
    WHERE prev_ts IS NULL
       OR epoch_us(ts) - epoch_us(prev_ts) > {_R30_GAP_S} * 1000000
"""


@q("r30_debounce", _R30_ORACLE)
def r30_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop any (user, type) event arriving within 60s of the PREVIOUS
    event of that type — the lag-based debounce (each event compares to
    its immediate predecessor, so an N-event burst keeps every event
    that is >gap from the one before it).  ONE keyed window pass with a
    (ts, event_id) deterministic order; integer-microsecond gap
    arithmetic so the boundary is bit-exact cross-engine.  The
    chain-collapse variant (keep only the FIRST of a whole burst chain)
    is gaps-and-islands — r21's machinery — documented here because the
    two are often confused: lag-debounce is a single window, chain
    collapse needs the island id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    return lagged.where(
        F.col("prev_ts").isNull()
        | (
            F.unix_micros("ts") - F.unix_micros("prev_ts")
            > _R30_GAP_S * 1_000_000
        )
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


# =============================================================================
# t36: language-ID confusion matrix (model evaluation).
# =============================================================================

_T36_ORACLE = f"""
    WITH scored AS (
        SELECT lang AS actual,
               {_lang_score_sql('de')} AS score_de,
               {_lang_score_sql('en')} AS score_en,
               {_lang_score_sql('es')} AS score_es,
               {_lang_score_sql('fr')} AS score_fr
        FROM documents
    ), pred AS (
        SELECT actual,
               CASE
                   WHEN greatest(score_de, score_en, score_es, score_fr) = 0
                       THEN 'und'
                   WHEN score_de = greatest(score_de, score_en, score_es,
                                            score_fr) THEN 'de'
                   WHEN score_en = greatest(score_de, score_en, score_es,
                                            score_fr) THEN 'en'
                   WHEN score_es = greatest(score_de, score_en, score_es,
                                            score_fr) THEN 'es'
                   ELSE 'fr'
               END AS predicted
        FROM scored
    ), cells AS (
        SELECT actual, predicted, count(*) AS n FROM pred GROUP BY 1, 2
    ), totals AS (
        SELECT actual, sum(n) AS row_n FROM cells GROUP BY 1
    )
    SELECT c.actual, c.predicted, c.n,
           round(CAST(c.n AS DOUBLE) / t.row_n, 6) AS row_share
    FROM cells c JOIN totals t ON c.actual = t.actual
"""


@q("t36_langid_confusion", _T36_ORACLE)
def t36_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-token language classifier vs the
    declared label: (actual, predicted) cell counts and the per-actual
    row share (recall on the diagonal, confusion mass off it).  The
    scoring pass is the same zero-shuffle projection as t3; the matrix
    is one keyed count + a broadcast row-total join — |langs|² cells,
    independent of corpus size.  t31 scores ONE binary signal (AUC);
    this shows WHERE a multi-class classifier bleeds."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("actual"),
        TX.lang_id(F.col("text")).alias("predicted"),
    )
    cells = pred.groupBy("actual", "predicted").agg(F.count("*").alias("n"))
    totals = cells.groupBy("actual").agg(F.sum("n").alias("row_n"))
    return cells.join(F.broadcast(totals), "actual").select(
        "actual",
        "predicted",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias(
            "row_share"
        ),
    )
