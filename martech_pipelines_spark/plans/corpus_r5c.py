"""Round-5c corpus additions (third wave of round 5).

Seven new first-class operators, each with a full DuckDB oracle:

- ``t30_countmin`` — mergeable Count-Min frequency sketch whose
  md5-derived cells make even the APPROXIMATE estimates value-checkable.
- ``h12_incremental_histogram`` — mergeable fixed-bin histogram
  percentiles, folded from 4 delta batches; oracle = full recompute
  (the IVM proof, like h6/h10/h11).
- ``mart9_transition_matrix`` — first-order Markov transition counts
  over each user's event sequence (journey analysis).
- ``r21_order_streaks`` — gaps-and-islands consecutive-day streaks
  (the classic islands idiom the window corpus lacked).
- ``s11_mips_topk`` — exact maximum-inner-product search; the
  norm-augmentation MIPS->cosine reduction is pinned in pytest.
- ``dd13_bloom_prefilter`` — deterministic Bloom membership pre-filter
  + exact verify, cross-corpus contamination audit form.
- ``w5_click_purchase_join`` — interval join of clicks to subsequent
  purchases; the batch twin of the stream-STREAM join
  ``streaming_click_purchase_join`` (equality pinned in pytest).

Registers into the shared QUERIES/ORACLE dicts at import time; names are
prepended to plans/__init__._WINDOW_PRIORITY so the driver's 50-slot
correctness window verifies the newest work first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import sketches as SK
from martech_pipelines_spark.operators import text as TX
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_extended import _DUCK_TOKENS
from martech_pipelines_spark.sources import load_table


# =============================================================================
# t30: Count-Min sketch frequency estimates (Cormode-Muthukrishnan).
# Reference scope: extension operator (SURVEY.md §7 north star — the
# mergeable-frequency state a streaming token monitor keeps instead of
# an unbounded exact vocabulary). t27 is the EXACT heavy-hitter answer;
# t30 is the O(depth*width) sketch that answers the same question with
# bounded state and one-sided error.
# =============================================================================

_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPN = 4, 64, 20

_T30_ORACLE = f"""
    WITH toks AS (
        SELECT unnest({_DUCK_TOKENS.format(col='text')}) AS token FROM documents
    ), exact AS (
        SELECT token, count(*) AS exact_cnt FROM toks GROUP BY token
    ), top AS (
        SELECT token, exact_cnt FROM (
            SELECT *, row_number() OVER (
                ORDER BY exact_cnt DESC, token ASC
            ) AS rn FROM exact
        ) WHERE rn <= {_CMS_TOPN}
    ), rows_ AS (
        SELECT unnest(range({_CMS_DEPTH})) AS r
    ), cells AS (
        SELECT r,
               ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || token),
                               1, 8))::BIGINT % {_CMS_WIDTH} AS c,
               count(*) AS cnt
        FROM toks CROSS JOIN rows_
        GROUP BY 1, 2
    ), est AS (
        SELECT t.token, min(coalesce(cl.cnt, 0)) AS cms_est
        FROM top t CROSS JOIN rows_ r
        LEFT JOIN cells cl
          ON cl.r = r.r
         AND cl.c = ('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || ':'
                                        || t.token), 1, 8))::BIGINT % {_CMS_WIDTH}
        GROUP BY t.token
    )
    SELECT t.token,
           CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - t.exact_cnt AS BIGINT) AS overestimate
    FROM top t JOIN est e USING (token)
    """


@q("t30_countmin", _T30_ORACLE)
def t30_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 4 x width 64, md5-derived cells) over the
    document token stream, read back for the top-20 exact tokens: exact
    count, sketch estimate, and the (always >= 0) overestimate. The
    sketch build's shuffle is bounded by depth*width rows per map task
    (partial aggregation); estimation is a broadcast of the 256-cell
    sketch. Deterministic hashing makes the approximate answer fully
    value-checkable; mergeability (sketch(A)+sketch(B) == sketch(A∪B))
    and the one-sided error bound are pinned in pytest.
    See ``sketches.countmin_sketch`` / ``countmin_estimate``."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_cnt"))
    w = Window.orderBy(F.desc("exact_cnt"), F.asc("token"))
    top = (
        exact.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _CMS_TOPN)
        .drop("rn")
    )
    sketch = SK.countmin_sketch(toks, "token", depth=_CMS_DEPTH, width=_CMS_WIDTH)
    est = SK.countmin_estimate(
        sketch, top.select("token"), "token", depth=_CMS_DEPTH, width=_CMS_WIDTH
    )
    return top.join(est, "token").select(
        "token",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overestimate"),
    )


# =============================================================================
# h12: mergeable fixed-bin histogram percentiles (IVM for a holistic
# aggregate). Exact percentiles cannot be maintained incrementally;
# a fixed-edge histogram is additive state. The query folds FOUR delta
# batches through histogram_merge and reads p50/p90/p99 — the oracle
# computes the same bins from the full table in one shot, so equality
# IS the incremental-maintenance proof (same contract as h6/h10/h11).
# =============================================================================

_H12_LO, _H12_HI, _H12_BINS = 0.0, 120000.0, 48
_H12_WIDTH = int((_H12_HI - _H12_LO) / _H12_BINS)  # 2500, integer by design

_H12_ORACLE = f"""
    WITH h AS (
        SELECT least(greatest(CAST(floor(l_extendedprice / {_H12_WIDTH}.0)
                                   AS BIGINT), 0), {_H12_BINS - 1}) AS bin,
               count(*) AS cnt
        FROM lineitem GROUP BY 1
    ), c AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin) AS cum_cnt,
               sum(cnt) OVER () AS total_cnt
        FROM h
    ), p AS (SELECT unnest([0.5, 0.9, 0.99]) AS pct)
    SELECT pct,
           CAST(bin AS BIGINT) AS bin,
           CAST(bin * {_H12_WIDTH} AS BIGINT) AS bin_lo,
           CAST((bin + 1) * {_H12_WIDTH} AS BIGINT) AS bin_hi,
           CAST(cum_cnt AS BIGINT) AS cum_cnt,
           CAST(total_cnt AS BIGINT) AS total_cnt
    FROM (
        SELECT p.pct, c.*, row_number() OVER (
            PARTITION BY p.pct ORDER BY c.bin
        ) AS rn
        FROM p JOIN c
          ON c.cum_cnt >= CAST(ceil(p.pct * c.total_cnt) AS BIGINT)
    ) WHERE rn = 1
    """


@q("h12_incremental_histogram", _H12_ORACLE)
def h12_incremental_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of ``l_extendedprice`` at bin-width resolution from a
    histogram MAINTAINED INCREMENTALLY: the table arrives as 4 delta
    batches (split on ``l_orderkey % 4``), each batch aggregates to its
    own <=48-row histogram, and ``histogram_merge`` folds them cell-wise
    — history is never re-scanned. The oracle recomputes the histogram
    from the full table directly, so value equality proves the merged
    state identical to the batch recompute. All-integer read side (bin
    edges, counts) — no float interpolation to diverge engines.
    See ``sketches.histogram_sketch`` / ``histogram_percentile_bins``."""
    li = load_table(spark, sf_dir, "lineitem")
    batches = [li.where(F.col("l_orderkey") % 4 == i) for i in range(4)]
    hist = SK.histogram_sketch(
        batches[0], "l_extendedprice", _H12_LO, _H12_HI, _H12_BINS
    )
    for b in batches[1:]:
        hist = SK.histogram_merge(
            hist, SK.histogram_sketch(b, "l_extendedprice", _H12_LO, _H12_HI, _H12_BINS)
        )
    return SK.histogram_percentile_bins(
        hist, [0.5, 0.9, 0.99], _H12_LO, _H12_HI, _H12_BINS
    )


# =============================================================================
# mart9: first-order Markov transition matrix over user journeys.
# Reference scope: extension mart (SURVEY.md §7 north star — the journey
# /next-best-action analysis run on the exported event stream). One
# user-keyed window (lead) + one small keyed agg; probabilities in
# integer per-mille so credit sums are summation-order-proof, same
# discipline as mart5/mart8.
# =============================================================================

_MART9_ORACLE = """
    WITH seq AS (
        SELECT event_type AS src_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst_type
        FROM events
    ), cnt AS (
        SELECT src_type, dst_type, count(*) AS n
        FROM seq WHERE dst_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT src_type, dst_type, CAST(n AS BIGINT) AS n,
           CAST((n * 1000) // sum(n) OVER (PARTITION BY src_type) AS BIGINT)
               AS per_mille
    FROM cnt
    """


@q("mart9_transition_matrix", _MART9_ORACLE)
def mart9_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: for each (src, dst) adjacent pair in
    a user's time-ordered event sequence, the transition count and its
    integer per-mille share of the source row. ONE user-keyed window
    (lead over ts, event_id tie-break) feeding a 25-cell aggregate — the
    per-mille window then runs over the tiny matrix, not the events."""
    ev = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(wseq).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    cnt = seq.groupBy("src_type", "dst_type").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("src_type")
    return cnt.select(
        "src_type",
        "dst_type",
        F.col("n").cast("long").alias("n"),
        F.floor((F.col("n") * 1000) / F.sum("n").over(wsrc))
        .cast("long")
        .alias("per_mille"),
    )


# =============================================================================
# r21: gaps-and-islands — consecutive-day order streaks per customer.
# The classic islands idiom (date minus row_number is constant within a
# run) the relational fill-in corpus (§2.J) did not yet cover. One
# customer-keyed window + two keyed aggs; no self-join.
# =============================================================================

_R21_ORACLE = """
    WITH d AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
        FROM orders
    ), isl AS (
        SELECT o_custkey, d,
               d - CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY d
               ) AS INTEGER) AS anchor
        FROM d
    ), runs AS (
        SELECT o_custkey, anchor, count(*) AS streak
        FROM isl GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(sum(streak) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(streak) AS BIGINT) AS longest_streak
    FROM runs GROUP BY o_custkey
    """


@q("r21_order_streaks", _R21_ORACLE)
def r21_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: distinct order days, number of consecutive-day
    islands, and the longest streak. Islands via the date-minus-rank
    anchor trick — a run of consecutive days shares one anchor date, so
    runs fall out of a plain groupBy instead of a sequence self-join.
    Everything stays partitioned by o_custkey across the window and both
    aggs (one shuffle total)."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    isl = d.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("o_custkey", "anchor").agg(F.count("*").alias("streak"))
    return runs.groupBy("o_custkey").agg(
        F.sum("streak").cast("long").alias("n_days"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("streak").cast("long").alias("longest_streak"),
    )


# =============================================================================
# s11: exact maximum-inner-product search (MIPS). Retrieval/recsys
# affinity ranks by RAW dot product, not cosine; the norm-augmentation
# reduction (Bachrach et al. 2014) that turns every cosine ANN index in
# this engine into a MIPS index is pinned against this exact baseline
# in pytest. Same broadcast-queries/no-corpus-shuffle plan as s1.
# =============================================================================

_S11_ORACLE = """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id % 25 = 0
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               round(list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])), 4)
                   AS dot_score
        FROM q CROSS JOIN embeddings e
    )
    SELECT query_id, vec_id, dot_score, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY dot_score DESC, vec_id ASC
        ) AS rnk
        FROM scored WHERE dot_score IS NOT NULL
    ) WHERE rnk <= 5
    """


@q("s11_mips_topk", _S11_ORACLE)
def s11_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 by inner product (every 25th vector as the query
    set): broadcast queries x corpus, rank on the ROUNDED dot product
    with vec_id tie-break. The MIPS->cosine augmentation equivalence
    (append sqrt(M^2-|x|^2) / 0) is pinned in pytest, which is what
    licenses reusing s2/s2b's ANN machinery for MIPS at scale.
    See ``similarity.mips_topk`` / ``augment_for_mips``."""
    from martech_pipelines_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.mips_topk(queries, emb, k=5)


# =============================================================================
# dd13: Bloom membership pre-filter + exact verify (cross-corpus form).
# Spark's runtime bloom pruning is a planner optimization (pinned as a
# plan demo in test_r5b_ops); dd13 makes the filter a first-class
# deterministic artifact: build over sources src0-src9's fingerprints,
# probe src10-src19, exact-verify ONLY bloom-positive docs. md5-derived
# bit positions => DuckDB recomputes the identical filter, so even the
# false-positive counts are value-checked.
# =============================================================================

_DD13_K, _DD13_M = 3, 4096

_DUCK_NORM_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)

_DD13_ORACLE = f"""
    WITH build AS (
        SELECT DISTINCT md5({_DUCK_NORM_TEXT}) AS fp
        FROM documents
        WHERE CAST(substr(source, 4) AS BIGINT) < 10
    ), ks AS (SELECT unnest(range({_DD13_K})) AS i),
    bloom AS (
        SELECT DISTINCT
            ('0x' || substr(md5('bloom' || CAST(i AS VARCHAR) || ':' || fp),
                            1, 8))::BIGINT % {_DD13_M} AS pos
        FROM build CROSS JOIN ks
    ), probe AS (
        SELECT doc_id, source, md5({_DUCK_NORM_TEXT}) AS fp
        FROM documents
        WHERE CAST(substr(source, 4) AS BIGINT) >= 10
    ), probed AS (
        SELECT p.doc_id, p.source, p.fp,
               count(b.pos) = {_DD13_K} AS bloom_hit
        FROM probe p CROSS JOIN ks
        LEFT JOIN bloom b
          ON b.pos = ('0x' || substr(md5('bloom' || CAST(ks.i AS VARCHAR)
                                         || ':' || p.fp), 1, 8))::BIGINT
                      % {_DD13_M}
        GROUP BY 1, 2, 3
    ), flagged AS (
        SELECT probed.*,
               bloom_hit AND fp IN (SELECT fp FROM build) AS true_dup
        FROM probed
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_probe,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_hits,
           CAST(sum(CASE WHEN true_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_dups,
           CAST(sum(CASE WHEN bloom_hit AND NOT true_dup THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives
    FROM flagged GROUP BY source
    """


@q("dd13_bloom_prefilter", _DD13_ORACLE)
def dd13_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus membership audit with a Bloom pre-filter: a k=3,
    m=4096 filter built from src0-src9's normalized-text fingerprints
    (the filter is ONE broadcast row holding <=4096 sorted ints), probed
    map-side by src10-src19, with the exact fingerprint semi-join run
    ONLY on bloom-positive candidates. Per-source confusion counts; no
    false negatives by construction (pinned in pytest), so the true-dup
    column is exact while the candidate sliver — not the corpus — pays
    the verify join. See ``dedup.bloom_prefilter_audit``."""
    from martech_pipelines_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    src_no = F.substring("source", 4, 10).cast("long")
    build = docs.where(src_no < 10)
    probe = docs.where(src_no >= 10)
    out = DD.bloom_prefilter_audit(build, probe, k=_DD13_K, m=_DD13_M)
    return out.select(
        "source",
        F.col("n_probe").cast("long").alias("n_probe"),
        F.col("n_bloom_hits").cast("long").alias("n_bloom_hits"),
        F.col("n_true_dups").cast("long").alias("n_true_dups"),
        F.col("n_false_positives").cast("long").alias("n_false_positives"),
    )


# =============================================================================
# w5: click -> purchase interval join (batch twin of the stream-STREAM
# join streaming_click_purchase_join; equality pinned in pytest — the
# first stream-stream join whose results are ALSO value-oracled). Same
# event surface as mart3/mart5/mart8 attribution but emitting the raw
# joined pairs, which is what the streaming state store materializes.
# =============================================================================

_W5_WINDOW_MIN = 60

_W5_ORACLE = f"""
    SELECT c.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.ts AS purchase_ts,
           c.ts AS click_ts,
           p.value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL {_W5_WINDOW_MIN} MINUTE
    """


@q("w5_click_purchase_join", _W5_ORACLE)
def w5_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, purchase) pair where the same user's click lands in
    the hour before the purchase — the batch twin of the stream-stream
    interval join (whose watermark + range predicate bound the state
    store; see ``streaming_click_purchase_join``). In batch the range
    predicate makes this a user-keyed equi-join with a residual time
    filter — one hash shuffle per side, never a cartesian."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {_W5_WINDOW_MIN} MINUTES")
        ),
    )
    return joined.select(
        "user_id", "purchase_id", "click_id", "purchase_ts", "click_ts", "value"
    )
