"""Round-5s corpus addition (final round-5 wave).

``t38_tfidf_keywords`` — per-document keyword extraction: top-5 terms
by tf-idf, the document-understanding primitive behind tagging, topic
drift monitoring and near-dup triage (complements t19's BM25, which
scores documents against a QUERY; this characterizes each document).

Registers into the shared QUERIES/ORACLE dicts at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators.text import tokens
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_extended import _DUCK_TOKENS
from martech_pipelines_spark.sources import load_table


_T38_TOP = 5

# Both engines rank on the ROUNDED score with a term tiebreak, so an
# unrounded last-ulp ln() difference can never flip the cut.
_T38_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest({_DUCK_TOKENS.format(col='text')}) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
        SELECT token, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.token, tf.tf,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4)
                   AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, token ASC
               ) AS rk
        FROM scored
    )
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, tfidf, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {_T38_TOP}
"""


@q("t38_tfidf_keywords", _T38_ORACLE)
def t38_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf keywords per document.  One tokenize pass feeds
    BOTH frequencies: per-(doc, term) tf (keyed agg, map-side combine)
    and per-term df derived from the tf table (so document frequency
    never re-reads raw text); corpus size joins in as a broadcast 1-row
    scalar; the per-doc top-5 is a row_number window whose partial
    WindowGroupLimit caps the ranked shuffle at 5 rows per doc per map
    task.  Ranking uses the ROUNDED score (identically in the oracle) —
    cross-engine ln() ulp drift cannot reorder the cut, and the term
    tiebreak makes the order total."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _T38_TOP)
        .select("doc_id", "token", "tf", "tfidf", "rk")
    )


# =============================================================================
# h18: incremental JOIN-view maintenance (the bilinear delta identity).
# =============================================================================

_H18_ORACLE = """
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment,
           round(o.o_totalprice, 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


@q("h18_incremental_join", _H18_ORACLE)
def h18_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM proof for a JOIN view: the enriched-orders view A⋈B
    maintained under insert deltas on BOTH sides via the bilinear
    identity  Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB  — the reason join views
    are maintainable without re-reading either full side: every delta
    term joins a DELTA against a (bounded) side, never full⋈full
    again.  Here orders and customer are each split in half (modular
    key split — both 'old' halves form the initial view, both 'new'
    halves arrive as deltas) and the view is assembled as
    old⋈old ∪ new⋈old ∪ old⋈new ∪ new⋈new; the oracle is the full
    recompute, so the identity (and its non-overlap — each joined pair
    lands in exactly one term) is value-checked, completing the IVM
    family: h6 aggregates, h7 sketches, h13/h16/h17 distinct states,
    h14 SCD2, h15 additive marts, h18 joins."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    a0 = od.where(F.col("o_orderkey") % 2 == 0)
    a1 = od.where(F.col("o_orderkey") % 2 == 1)
    b0 = cust.where(F.col("c_custkey") % 2 == 0)
    b1 = cust.where(F.col("c_custkey") % 2 == 1)

    def j(a, b):
        return a.join(b, a["o_custkey"] == b["c_custkey"]).select(
            "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "total"
        )

    view = j(a0, b0)
    view = view.unionByName(j(a1, b0))   # ΔA ⋈ B_old
    view = view.unionByName(j(a0, b1))   # A_old ⋈ ΔB
    view = view.unionByName(j(a1, b1))   # ΔA ⋈ ΔB
    return view
