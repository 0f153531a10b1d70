"""Round-5q corpus addition: ORC source round-trip.

``a10_orc_roundtrip`` — the remaining built-in columnar format: the
customer table written to ORC (zlib, Spark's native writer) and read
back through ``sources.read_orc``; the read-back rows are oracle-checked
value-identical against the parquet source of truth, proving the format
path end to end (type mapping, predicate-capable scan).  Parquet, CSV,
JSON-lines, text-conf and binaryFile already have corpus entries
(a1/a5/a9/a4/mm1); ORC closes the set of formats Spark ships without
extra packages (Avro needs the external spark-avro artifact — import-
gated, out of scope for this container).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.sources.readers import read_orc


_ORC_WRITTEN: set[str] = set()


def write_customer_orc(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the deterministic ORC copy of customer.  Path keyed
    by full dataset path + pid (same hygiene as a9's jsonl log: no
    cross-sf aliasing, no concurrent-session overwrite races).  Written
    once per (sf_dir, process) — bench repeats reuse the first write —
    and removed at interpreter exit so /tmp does not accumulate a
    directory per process."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out_dir = os.path.join("/tmp", f"mp_spark_orc_{tag}_{os.getpid()}")
    if out_dir in _ORC_WRITTEN:
        return out_dir
    load_table(spark, sf_dir, "customer").coalesce(4).write.mode(
        "overwrite"
    ).orc(out_dir)
    _ORC_WRITTEN.add(out_dir)
    atexit.register(shutil.rmtree, out_dir, ignore_errors=True)
    return out_dir


@q("a10_orc_roundtrip", "SELECT * FROM customer")
def a10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the ORC source: customer written with Spark's
    native ORC writer, read back via ``read_orc``, compared against the
    parquet source of truth — longs, strings and doubles must all map
    through ORC's type system unchanged.  Filter pushdown into the ORC
    scan is plan-asserted in pytest (ORC supports predicate pushdown
    like parquet; a format path that silently full-scans would be a
    100-TB regression)."""
    path = write_customer_orc(spark, sf_dir)
    return read_orc(spark, path)


# =============================================================================
# t37: lexicon-join sentiment scoring (SURVEY §7.3's sentiment-lexicon
# join bullet; the last unticked item of the extended text surface).
# =============================================================================

_T37_LEXICON = {"fast": 1, "big": 1, "fresh": 1, "slow": -1, "small": -1, "stale": -1}


def _t37_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_extended import _DUCK_TOKENS

    case = " ".join(
        f"WHEN '{w}' THEN {v}" for w, v in _T37_LEXICON.items()
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({_DUCK_TOKENS.format(col='text')}) AS token
        FROM documents
    )
    SELECT doc_id,
           CAST(sum(CASE token {case} ELSE 0 END) AS BIGINT) AS sent_mass,
           count(*) AS n_tokens,
           round(CAST(sum(CASE token {case} ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS sent_score,
           CASE WHEN sum(CASE token {case} ELSE 0 END) > 0 THEN 'pos'
                WHEN sum(CASE token {case} ELSE 0 END) < 0 THEN 'neg'
                ELSE 'neu' END AS sent_label
    FROM toks GROUP BY doc_id
    """


@q("t37_sentiment", _t37_oracle())
def t37_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sentiment over the synthetic corpus vocabulary via the
    broadcast lexicon join (see ``text.sentiment_scores`` — the form
    that survives a 100k-entry lexicon; the oracle folds the same
    lexicon as a CASE).  LEFT join semantics keep zero-hit docs."""
    from martech_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    return TX.sentiment_scores(docs, _T37_LEXICON)


# =============================================================================
# h17: incrementally-maintained rolling WAU (shares r31's oracle);
# g3: common-neighbors link prediction over the support-thresholded
# co-purchase graph.
# =============================================================================


def _r31_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_r5p import _R31_ORACLE

    return _R31_ORACLE


@q("h17_incremental_rolling_active", _r31_oracle())  # SHARES r31's oracle
def h17_incremental_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM proof for the rolling-WAU curve: the (day, user) state folded
    over three event_id-split delta batches (out of time order — late
    data must land in old days), then read through the same
    ``rolling_active_from_state`` fan-out.  The oracle is r31's full
    recompute, so incremental == full is engine-checked.  The h13/h16
    pattern applied to a SLIDING distinct count: the state is the same
    mergeable (day, user) table; only the read differs."""
    from pyspark.sql import functions as F

    from martech_pipelines_spark.operators.transforms import (
        merge_user_days,
        rolling_active_from_state,
        user_days_of,
    )

    ev = load_table(spark, sf_dir, "events")
    state = user_days_of(ev.where(F.col("event_id") % 3 == 0))
    state = merge_user_days(state, ev.where(F.col("event_id") % 3 == 1))
    state = merge_user_days(state, ev.where(F.col("event_id") % 3 == 2))
    return rolling_active_from_state(state, window_days=7)


_G3_MIN_SUPPORT = 2
_G3_MIN_COMMON = 2

_G3_ORACLE = f"""
    WITH lp AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), e AS (
        SELECT a.p AS src, b.p AS dst
        FROM lp a
        JOIN lp b ON a.k = b.k AND a.p < b.p
        GROUP BY 1, 2
        HAVING count(*) >= {_G3_MIN_SUPPORT}
    ), adj AS (
        SELECT src AS u, dst AS n FROM e
        UNION ALL
        SELECT dst AS u, src AS n FROM e
    ), deg AS (
        SELECT n AS node, count(*) AS degree FROM adj GROUP BY 1
    ), cand AS (
        SELECT w1.n AS a, w2.n AS b, count(*) AS common_neighbors
        FROM adj w1 JOIN adj w2 ON w1.u = w2.u AND w1.n < w2.n
        GROUP BY 1, 2
        HAVING count(*) >= {_G3_MIN_COMMON}
    ), nonadj AS (
        SELECT c.* FROM cand c
        LEFT JOIN e ON e.src = c.a AND e.dst = c.b
        WHERE e.src IS NULL
    )
    SELECT n.a AS p1, n.b AS p2, n.common_neighbors,
           round(CAST(n.common_neighbors AS DOUBLE)
                 / (d1.degree + d2.degree - n.common_neighbors), 6) AS jaccard
    FROM nonadj n
    JOIN deg d1 ON d1.node = n.a
    JOIN deg d2 ON d2.node = n.b
    ORDER BY n.common_neighbors DESC, p1, p2
    LIMIT 50
"""


@q("g3_link_prediction", _G3_ORACLE)
def g3_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 predicted co-purchase links: non-adjacent part pairs
    sharing >= 2 neighbors in the support-2 co-purchase graph, Jaccard-
    scored — the candidate generator behind "customers who bought these
    also bought".  Wedge enumeration is unoriented (common-neighbor
    counts need every center), so the SUPPORT THRESHOLD is the scale
    knob (see ``link_prediction``): support-1 co-occurrence is noise
    for recommendation and quadratically inflates the wedge count as
    facts grow against a fixed catalog."""
    from martech_pipelines_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges_undirected(li, min_support=_G3_MIN_SUPPORT)
    return G.link_prediction(
        edges, min_common=_G3_MIN_COMMON, top_n=50
    )


# =============================================================================
# w7: session-scoped conversion (session_window composition).
# =============================================================================

_W7_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts, event_type,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), per_sess AS (
        SELECT user_id, sid,
               CAST(date_trunc('day', min(ts)) AS DATE) AS day,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_conv
        FROM sess GROUP BY user_id, sid
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           count(*) AS n_sessions,
           CAST(sum(has_view) AS BIGINT) AS view_sessions,
           CAST(sum(has_view * has_conv) AS BIGINT) AS converting_sessions,
           round(CAST(sum(has_view * has_conv) AS DOUBLE)
                 / nullif(sum(has_view), 0), 6) AS session_cvr
    FROM per_sess GROUP BY day
"""


@q("w7_session_conversion", _W7_ORACLE)
def w7_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session conversion over 30-minute session windows: the w3
    sessionization composed with presence flags folded into the SAME
    session aggregation (one pass over events; see
    ``windows.session_conversion``).  The oracle spells Spark's
    session_window as gaps-and-islands (w3's validated convention:
    a >=30min arrival starts a new session, sessions keyed to their
    start day)."""
    from martech_pipelines_spark.operators import windows as WIN

    ev = load_table(spark, sf_dir, "events")
    return WIN.session_conversion(ev)
