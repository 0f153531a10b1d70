"""Round-5d corpus additions (fourth wave of round 5).

New first-class operator families, each with a full DuckDB oracle unless
noted:

- ``r22_asof_join`` — generic backward AS-OF join (latest right row at or
  before each left row, per key, within tolerance), built JOIN-FREE as a
  union + carry-forward window (``operators/joins.asof_join``).
- ``r23_campaign_range_join`` — interval/range join via time-bucket
  equi-join (``operators/joins.range_join``): no cartesian, no
  broadcast-NLJ; the classic "events into campaign windows" rollup.
- ``r24_cube`` — CUBE grouping sets with grouping_id (all marginals, the
  sets ROLLUP never emits; the hierarchy form is r4_rollup).
- ``r25_pivot`` — wide pivot on a low-cardinality column with an explicit
  value list (no distinct-scan job), count + sum per cell.
- ``r26_group_linreg`` — closed-form per-group OLS (slope/intercept) from
  one aggregation pass of integer-exact moments.
- ``t31_classifier_auc`` — exact ROC-AUC of the t29 hashed linear scorer
  against ground-truth language labels, computed the SCALE way: group by
  distinct score then one tiny window, never a global row sort.
- ``s12_covariance`` / ``s12b_covariance_arrow`` — embedding covariance
  cells, exact oracle form + mapInPandas Gram-partial scale twin sharing
  the same oracle.
- ``s13_pca_project`` *(rows-only: eigendecomposition)* — top-4 PCA
  projection with deterministic component signs; gates in pytest.
- ``g1_pagerank_copurchase`` — 3-iteration PageRank over the lineitem
  co-purchase part graph, full oracle via unrolled iterations.

Registers into the shared QUERIES/ORACLE dicts at import time; names are
prepended to plans/__init__._WINDOW_PRIORITY so the driver's 50-slot
correctness window verifies the newest work first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import graph as G
from martech_pipelines_spark.operators import joins as J
from martech_pipelines_spark.operators import linalg as LA
from martech_pipelines_spark.operators import text as TX
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_extended import _DUCK_TOKENS
from martech_pipelines_spark.sources import load_table


# =============================================================================
# r22: generic backward AS-OF join (purchase -> latest prior view, <=72h).
# Reference scope: the two-table generalisation of the reference's
# latest-row-per-key compaction (martech_pipelines/tasks/user_profile/
# clevertap.py:30-53); §2.J extension surface — Spark has no ASOF JOIN
# primitive (DuckDB/Pandas do), so operators/joins.asof_join supplies it.
# =============================================================================

_R22_ORACLE = """
    WITH u AS (
        SELECT user_id, ts, 0 AS side, event_id AS v_id,
               CAST(NULL AS BIGINT) AS p_id
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, 1, NULL, event_id
        FROM events WHERE event_type = 'purchase'
    ), carried AS (
        SELECT user_id, ts, side, p_id,
               last_value(v_id IGNORE NULLS) OVER w AS m_id,
               last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
                   OVER w AS m_ts
        FROM u
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts, side, v_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
    )
    SELECT user_id,
           p_id AS purchase_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN m_ts >= ts - INTERVAL 72 HOUR THEN m_id END AS view_id,
           CASE WHEN m_ts >= ts - INTERVAL 72 HOUR THEN
               (epoch_us(ts) - epoch_us(m_ts)) // 60000000
           END AS gap_min
    FROM carried WHERE side = 1
"""


@q("r22_asof_join", _R22_ORACLE)
def r22_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase picks up the user's single most recent view at or
    before it, but only if it is within 72 hours — the generic AS-OF
    join.  JOIN-FREE plan: one union, ONE hash exchange on user_id, one
    carry-forward window; a user with a million views never materialises
    candidate pairs (the naive join+rank form fans out per key).  The
    oracle spells the identical union+window in ANSI SQL, so the
    semantics — inclusive boundary, max-event_id tiebreak at equal ts,
    NULL on no-match-or-stale — are engine-checked end to end.
    (corpus_extended's r6_asof_join is the inline single-column special
    case; this exercises the reusable operator: arbitrary payload,
    tolerance, left-outer NULLs.)"""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = J.asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_payload=["event_id"],
        tolerance=F.expr("INTERVAL 72 HOURS"),
    )
    return joined.select(
        "user_id",
        "purchase_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("event_id_asof").alias("view_id"),
        (
            (F.unix_micros("ts") - F.unix_micros("view_ts_asof"))
            / F.lit(60000000)
        ).cast("long").alias("gap_min"),
    )


# =============================================================================
# r23: interval join via time-bucket equi-join (events -> campaign windows).
# Reference scope: §2.J extension surface; the reference's pipelines slice
# the event stream by config-driven date windows (tasks/*/config usage of
# yesterday()/today() bounds) — this is the many-overlapping-windows form.
# =============================================================================

_R23_ORACLE = """
    WITH c AS (
        SELECT i AS campaign_id,
               TIMESTAMP '2024-01-01' + INTERVAL 18 HOUR * i AS start_ts,
               TIMESTAMP '2024-01-01' + INTERVAL 18 HOUR * i
                   + INTERVAL 12 HOUR * ((i % 3) + 1) AS end_ts
        FROM (SELECT unnest(range(40)) AS i)
    )
    SELECT c.campaign_id,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           round(sum(e.value), 2) AS sum_value
    FROM c JOIN events e
      ON e.ts >= c.start_ts AND e.ts < c.end_ts
    GROUP BY 1
"""


@q("r23_campaign_range_join", _R23_ORACLE)
def r23_campaign_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events matched into 40 overlapping campaign windows (12/24/36 h,
    every 18 h) and rolled up per campaign.  The naive plan is a
    cartesian with an inequality filter; ``range_join`` buckets time at
    12 h so the match becomes an EQUI-join on the bucket key with the
    exact [start, end) predicate applied after — each event hits exactly
    one bucket, each interval lists a bucket once, no dedup needed.  At
    100 TB the bucket width tracks the p99 interval length so interval
    fan-out stays O(1) while the join shuffles on a high-cardinality
    time key.  (r7_range_join broadcasts its 10 value bands — fine for a
    tiny band dim; this is the form for MANY intervals, where broadcast
    NLJ would scan every interval per event.)"""
    anchor = 1704067200  # 2024-01-01 00:00:00 UTC
    camp = spark.range(40).select(
        F.col("id").alias("campaign_id"),
        F.timestamp_seconds(anchor + F.col("id") * 64800).alias("start_ts"),
        F.timestamp_seconds(
            anchor + F.col("id") * 64800 + ((F.col("id") % 3) + 1) * 43200
        ).alias("end_ts"),
    )
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "value")
    matched = J.range_join(
        ev, camp, "ts", "start_ts", "end_ts", bucket_seconds=43200
    )
    return matched.groupBy("campaign_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# =============================================================================
# r24: CUBE grouping sets with grouping_id (completes the grouping-sets
# surface next to corpus_extended's r4_rollup hierarchy totals).
# Reference scope: §2.J absent-category fill-in (OLAP subtotals; the
# reference's E3/E4 counters are the 0-dimensional special case).
# =============================================================================

_R24_ORACLE = """
    SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@q("r24_cube", _R24_ORACLE)
def r24_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 4 grouping sets of CUBE(l_returnflag, l_linestatus) — leaf
    groups, BOTH one-dimension marginals, and the grand total — in ONE
    pass: Spark Expands each row into its grouping sets before the
    partial aggregate, so the single exchange carries pre-combined
    partials (same cost model as a sliding window's Expand; 4x map-side
    rows, never a second scan per subtotal level).  grouping_id
    disambiguates subtotal rows from legitimate 'ALL' values.  The
    ROLLUP cousin (strict hierarchy) is corpus_extended's r4_rollup;
    CUBE adds the cross-marginal sets a rollup never emits."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "lvl",
            "n_rows",
            "sum_qty",
            "revenue",
        )
    )


# =============================================================================
# r25: pivot to wide per-user event-type matrix.
# Reference scope: §2.J fill-in — the export sinks (B4/B5) ship wide
# per-user property rows; pivot is how the event log becomes one.
# =============================================================================

_R25_TYPES = ["view", "click", "purchase", "signup", "error"]

_R25_ORACLE = """
    SELECT user_id,
           {cells}
    FROM events
    GROUP BY user_id
""".format(
    cells=",\n           ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS {t}_n,\n"
        f"           round(sum(value) FILTER (WHERE event_type = '{t}'), 2)"
        f" AS {t}_val"
        for t in _R25_TYPES
    )
)


@q("r25_pivot", _R25_ORACLE)
def r25_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide pivot: per-user count and value sum for each event
    type, with an EXPLICIT value list — passing the values to
    ``pivot()`` skips the eager distinct-scan job Spark otherwise runs,
    and keeps the plan a single groupBy(user_id) shuffle with pivot
    cells evaluated as conditional aggregates (identical cost model to
    the FILTER form in the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _R25_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("val"),
        )
    )
    # Spark names pivot columns "<value>_<aggAlias>"; match the oracle's
    # <type>_n / <type>_val and zero-fill counts (Spark pivot leaves the
    # count cell NULL for users with no such event; COUNT FILTER gives 0).
    cols = [F.col("user_id")]
    for t in _R25_TYPES:
        cols.append(
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n")
        )
        cols.append(F.col(f"{t}_val"))
    return wide.select(*cols)


# =============================================================================
# r26: per-group closed-form OLS (trend detection).
# Reference scope: §2.J extension surface — the reward/value trend a
# martech team fits per event type; one aggregation pass, integer-exact
# moments so both engines divide identical numbers.
# =============================================================================

_R26_ORACLE = """
    WITH pts AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(floor(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), m AS (
        SELECT event_type,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM pts GROUP BY 1
    )
    SELECT event_type, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n,
                 6) AS intercept
    FROM m
"""


@q("r26_group_linreg", _R26_ORACLE)
def r26_group_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value over day index: the
    closed-form slope/intercept from five distributive moments (n, Σx,
    Σy, Σxx, Σxy) — ONE map-side-combined aggregation, no second pass,
    no regr_* nondeterminism.  x is a small day integer and y integer
    centi-units, so every moment is exact in BIGINT and both engines
    divide bit-identical operands (float summation order can't perturb
    the fit)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pts = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long").alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope_raw = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return m.select(
        "event_type",
        "n",
        F.round(slope_raw, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope_raw * F.col("sx"))
            / F.col("n"),
            6,
        ).alias("intercept"),
    )


# =============================================================================
# t31: exact ROC-AUC of the hashed linear classifier (model evaluation).
# Reference scope: §2.J north-star — the eval step after t29's scoring;
# computed by score-histogram, the only formulation that survives 100 TB.
# =============================================================================

_T31_SCORE = (
    "CAST(coalesce(list_sum(list_transform(tok, t ->"
    " (('0x' || substr(md5('qc:' || t), 1, 8))::BIGINT"
    f" % {TX.QC_BUCKETS}) * {TX.QC_WEIGHT_MULT}"
    f" % {TX.QC_WEIGHT_MOD} - {(TX.QC_WEIGHT_MOD - 1) // 2}"
    ")), 0) AS BIGINT)"
)

_T31_ORACLE = f"""
    WITH toks AS (
        SELECT (lang = 'en') AS pos,
               {_DUCK_TOKENS.format(col='text')} AS tok
        FROM documents
    ), scored AS (
        SELECT pos, {_T31_SCORE} AS score FROM toks
    ), by_score AS (
        SELECT score,
               count(*) FILTER (WHERE pos) AS p,
               count(*) FILTER (WHERE NOT pos) AS ng
        FROM scored GROUP BY score
    ), cum AS (
        SELECT p, ng,
               coalesce(sum(ng) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_ng
        FROM by_score
    )
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(ng) AS BIGINT) AS n_neg,
           round(CAST(sum(p * (2 * cum_ng + ng)) AS DOUBLE)
                 / (2.0 * sum(p) * sum(ng)), 6) AS auc
    FROM cum
"""


@q("t31_classifier_auc", _T31_ORACLE)
def t31_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney ROC-AUC of the t29 scorer against ground-truth
    (lang == 'en') labels, WITHOUT a global row sort: scores aggregate
    to a (score -> pos, neg) histogram first (one keyed shuffle over
    distinct integer scores), then one tiny window over the histogram
    accumulates negatives-below and U = Σ p·(2·cum_neg + neg) gives
    AUC = U / (2·P·N).  Everything before the final division is integer,
    so the tie-handling (half credit) is bit-exact across engines.  The
    single-partition window runs over |distinct scores| rows, not |docs|
    — the formulation that still works when docs is 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    scored = TX.hashed_linear_score(docs, extra_cols=("lang",))
    by_score = (
        scored.select(
            F.col("score_milli").alias("score"),
            (F.col("lang") == "en").alias("pos"),
        )
        .groupBy("score")
        .agg(
            F.count(F.when(F.col("pos"), 1)).alias("p"),
            F.count(F.when(~F.col("pos"), 1)).alias("ng"),
        )
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_score.withColumn(
        "cum_ng", F.coalesce(F.sum("ng").over(w), F.lit(0))
    )
    return cum.agg(
        F.sum("p").alias("n_pos"),
        F.sum("ng").alias("n_neg"),
        F.round(
            F.sum(F.col("p") * (2 * F.col("cum_ng") + F.col("ng")))
            .cast("double")
            / (2.0 * F.sum("p") * F.sum("ng")),
            6,
        ).alias("auc"),
    )


# =============================================================================
# s12: embedding covariance matrix (second-moment statistics).
# Reference scope: §2.J north-star — the statistics PCA/whitening/drift
# detection need before IVF/PQ indexing at scale.
# =============================================================================

# Integer-exact contract (round-6 hardening of the r5 driver hash-fail):
# quantize each value to floor(x*10^6 + 0.5) — pure IEEE double ops, no
# .5-tie round() ambiguity — accumulate exact integer moments, and round
# the covariance with integer half-up division.  Every intermediate is an
# associative integer sum or a deterministic function of identical
# integers, so the output doubles are bit-identical across engines,
# partitionings, and summation orders.  Mirrors
# operators/linalg.py:_exact_cov_from_moments.
_S12_ORACLE = """
    WITH e AS (
        SELECT vec_id,
               CAST(i AS INTEGER) - 1 AS dim,
               CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT) AS xq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
    ),
    mo AS (
        SELECT a.dim AS i, b.dim AS j,
               count(*) AS n,
               sum(CAST(a.xq AS HUGEINT) * b.xq) AS sxy,
               sum(CAST(a.xq AS HUGEINT)) AS sx,
               sum(CAST(b.xq AS HUGEINT)) AS sy
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    ),
    fin AS (
        SELECT i, j,
               (CAST(n AS HUGEINT) * sxy - sx * sy) * 100000 AS num,
               CAST(n AS HUGEINT) * n * 1000000000000 AS den
        FROM mo
    )
    SELECT i, j,
           CAST(CASE WHEN num >= 0 THEN (2*num + den) // (2*den)
                     ELSE -((-2*num + den) // (2*den)) END AS DOUBLE)
           / 100000.0 AS cov
    FROM fin
"""


@q("s12_covariance", _S12_ORACLE)
def s12_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance cells cov(i, j), i <= j, via posexplode +
    within-row-key self-join + one keyed aggregation — the
    oracle-expressible form (O(n·d²) through the shuffle).  The scale
    twin ``s12b_covariance_arrow`` computes the same cells from
    per-partition numpy Gram partials and shares this oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return LA.embedding_covariance(
        emb, "embedding", round_dp=5, id_col="vec_id"
    )


@q("s12b_covariance_arrow", _S12_ORACLE)
def s12b_covariance_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB covariance: ``mapInPandas`` accumulates one d×d numpy
    Gram partial per partition (X.T @ X — BLAS, not per-pair rows) and
    the shuffle reduces num_partitions·d² cells instead of n·d².  Shares
    s12's oracle, so the Arrow kernel's arithmetic is engine-checked,
    not just self-consistent."""
    emb = load_table(spark, sf_dir, "embeddings")
    return LA.embedding_covariance_arrow(emb, "embedding", round_dp=5)


# =============================================================================
# s13: PCA projection (rows-only: eigendecomposition is trained state,
# like the k-means codebooks of s2b/s8).
# =============================================================================


@q("s13_pca_project")
def s13_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 PCA projection of every embedding: covariance cells reduce
    to the driver (d·(d+1)/2 values — independent of row count), numpy
    eigh with a deterministic sign convention, then the projection runs
    as pure codegen ``zip_with``/``aggregate`` expressions over broadcast
    literal components — zero Python in the per-row path.  Rows-only
    (eigenvectors are trained state); orthonormality, explained-variance
    ordering and reconstruction-error gates live in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, _vals = LA.pca_components(
        emb, "embedding", k=4, id_col="vec_id"
    )
    out = LA.pca_project(emb, mean, comps, "embedding", out_col="pca")
    return out.select(
        "vec_id",
        F.col("pca")[0].alias("pc0"),
        F.col("pca")[1].alias("pc1"),
        F.col("pca")[2].alias("pc2"),
        F.col("pca")[3].alias("pc3"),
    )


# =============================================================================
# g1: PageRank over the co-purchase part graph.
# Reference scope: §2.J north-star — "customers who bought X also bought
# Y" graph centrality; the OTHER iterative graph primitive next to
# dedup.py's connected components, with a full oracle via unrolled
# fixed iterations.
# =============================================================================

_G1_ITER = """
    i{k} AS (
        SELECT e.dst AS node, sum(r.rank / d.deg) AS inflow
        FROM edges e
        JOIN r{p} r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY 1
    ), m{p} AS (
        SELECT sum(rank) AS m
        FROM r{p} JOIN deg ON r{p}.node = deg.src
    ),
    r{k} AS (
        SELECT nodes.node,
               0.15 / nn.n
               + 0.85 * (coalesce(i{k}.inflow, 0) + (1 - m{p}.m) / nn.n)
                   AS rank
        FROM nodes LEFT JOIN i{k} ON nodes.node = i{k}.node, nn, m{p}
    )"""

_G1_ORACLE = (
    """
    WITH li AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
    ), deg AS (
        SELECT src, count(*) AS deg FROM edges GROUP BY 1
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), nn AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), r0 AS (
        SELECT node, 1.0 / nn.n AS rank FROM nodes, nn
    ),"""
    + _G1_ITER.format(k=1, p=0)
    + ","
    + _G1_ITER.format(k=2, p=1)
    + ","
    + _G1_ITER.format(k=3, p=2)
    + """
    SELECT node, round(rank, 8) AS rank FROM r3
"""
)


@q("g1_pagerank_copurchase", _G1_ORACLE)
def g1_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the co-purchase graph: parts
    are linked when they ship in the same order.  Edge build is a
    keyed self-join on the order key (bounded per-order fan-out, never a
    cartesian); each iteration is one ranks⋈edges join + one keyed sum —
    the per-iteration shuffle carries only (node, contribution) pairs,
    and the degree-annotated edge list is persisted once and reused.
    The oracle unrolls the identical three iterations; the dangling-mass
    term is identically ZERO here by construction (mirrored edge list ⇒
    every node has out-degree >= 1), so the engine runs the
    ``assume_no_dangling`` fast path — no per-iteration linked-mass job
    or broadcast — while graphs with sinks keep the generic
    redistribution (pinned separately in test_r5d_ops).  The iterative
    distributed loop is value-checked against closed SQL, not just
    self-consistent."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    ranks = G.pagerank(
        edges, iterations=3, damping=0.85, assume_no_dangling=True
    )
    return ranks.select("node", F.round("rank", 8).alias("rank"))
