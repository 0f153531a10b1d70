"""Round-9 corpus additions.

``s29b_graph_ann_beam_lsh`` — the PRODUCTION registration of graph-ANN
                          beam search (VERDICT r8 "What's wrong" #1):
                          the same fixed-hop deterministic beam as s29,
                          but over the banded-LSH kNN graph (s10b's
                          build — a keyed self-join with NO driver
                          collect anywhere), so the whole registered
                          path is shuffle-only at 100 TB.  The exact
                          s29 build stays the oracle anchor; this form
                          carries its OWN full oracle because the
                          md5-derived hyperplanes make the LSH graph
                          value-checkable too.
``s2j_kmeans_lloyd_det`` — Lloyd's k-means itself in a deterministic,
                          oracle-able form (VERDICT r8 "Next round"
                          #6): fixed iterations, quantized-integer
                          centroids, total tie-breaks — the LAST
                          unoracled stage of the ANN program
                          value-checked end to end.

Reference parity: the reference repo (gauravkumar-ny/martech-pipelines)
has no ANN surface; these extend the LLM-data-pipeline program
(SURVEY.md "beyond the reference" mandate) on the synthetic
``embeddings`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.plans.corpus_extended import _banded_sql, _rp_sig_sql
from martech_pipelines_spark.plans.corpus_r8b import (
    _S29_BEAM,
    _S29_GK,
    _S29_HOPS,
    _S29_K,
    _s29_oracle,
)
from martech_pipelines_spark.sources import load_table

# ---------------------------------------------------------------------------
# s29b: graph-ANN beam search over the banded-LSH graph (production form)
# ---------------------------------------------------------------------------

# s10b's band geometry at gate scale (32-bit signature, 4 bands of 8
# bits); the graph out-degree matches s29's exact build so the two forms
# differ ONLY in edge construction.
_S29B_BITS = 32
_S29B_BANDS = 4

_S29B_GRAPH_BLOCK = f"""sig AS (
        SELECT vec_id, v, {_rp_sig_sql('v', 64, _S29B_BITS)} AS sig FROM base
    ), banded AS ({_banded_sql('sig', _S29B_BANDS, _S29B_BITS // _S29B_BANDS)}),
    gcand AS (
        SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS nbr_id
        FROM banded a JOIN banded b USING (band, band_val)
        WHERE a.vec_id <> b.vec_id
    ), g AS (
        SELECT src_id, nbr_id FROM (
            SELECT c.src_id, c.nbr_id,
                   row_number() OVER (
                       PARTITION BY c.src_id
                       ORDER BY round(
                           list_dot_product(x.v, y.v)
                           / (sqrt(list_dot_product(x.v, x.v))
                              * sqrt(list_dot_product(y.v, y.v))), 4) DESC,
                           c.nbr_id ASC
                   ) AS rn
            FROM gcand c
            JOIN base x ON x.vec_id = c.src_id
            JOIN base y ON y.vec_id = c.nbr_id
            WHERE list_dot_product(x.v, x.v) > 0
              AND list_dot_product(y.v, y.v) > 0
        ) WHERE rn <= {_S29_GK}
    )"""


@q("s29b_graph_ann_beam_lsh", _s29_oracle(_S29B_GRAPH_BLOCK))
def s29b_graph_ann_beam_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s29's 100-TB registration: identical fixed-hop beam search, but
    the graph build is the banded-LSH self-join (``knn_graph_lsh`` —
    s10b's plan: candidate pairs from a (band, band_val) keyed shuffle,
    exact cosine re-rank of collisions only, NO driver collect or
    corpus broadcast anywhere), closing VERDICT r8's one perf-weak
    finding.  The exact build (s29) stays as the oracle anchor and the
    recall reference; deterministic md5-derived hyperplanes make this
    approximate build fully value-checkable as well, so BOTH ends of
    the build trade carry complete oracles.  Search shape per hop is
    unchanged: one keyed join of the (|Q| x beam) beam table against
    the adjacency list plus two skinny vector-fetch joins."""
    from martech_pipelines_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    graph = SIM.knn_graph_lsh(
        emb, dim=64, k=_S29_GK, bits=_S29B_BITS, bands=_S29B_BANDS
    ).select("src_id", "nbr_id")
    entry = emb.agg(F.min("vec_id")).collect()[0][0]  # 1-row control plane
    return SIM.graph_ann_beam_search(
        queries,
        emb,
        graph,
        entry_id=entry,
        hops=_S29_HOPS,
        beam=_S29_BEAM,
        k=_S29_K,
    )


# ---------------------------------------------------------------------------
# s2j: deterministic Lloyd's k-means — the training loop itself, oracled
# ---------------------------------------------------------------------------

_S2J_ITERS = 2
_S2J_NLIST = 16

_S2J_QVEC = "list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x*1000000 + 0.5))"

_S2J_D2Q = (
    "CAST(list_dot_product(x.q, x.q) + list_dot_product(c.cq, c.cq)"
    " - 2*list_dot_product(x.q, c.cq) AS BIGINT)"
)


def _s2j_oracle() -> str:
    blocks = [
        f"""xq AS (
        SELECT vec_id, {_S2J_QVEC} AS q FROM embeddings
    ), reps AS (
        SELECT CAST(vec_id % {_S2J_NLIST} AS INTEGER) AS cell,
               min(vec_id) AS rid
        FROM embeddings GROUP BY 1
    ), c0 AS (
        SELECT r.cell, x.q AS cq FROM reps r JOIN xq x ON x.vec_id = r.rid
    )"""
    ]
    for i in range(_S2J_ITERS):
        blocks.append(
            f"""s{i} AS (
        SELECT x.vec_id, c.cell, {_S2J_D2Q} AS d2q
        FROM xq x CROSS JOIN c{i} c
    ), a{i} AS (
        SELECT vec_id, cell FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2q, cell
            ) AS rn FROM s{i}
        ) WHERE rn = 1
    ), u{i} AS (
        SELECT a.cell, t.i AS pos,
               CAST(sum(x.q[t.i]) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM a{i} a JOIN xq x USING (vec_id)
        CROSS JOIN (SELECT CAST(range AS INTEGER) AS i FROM range(1, 65)) t
        GROUP BY 1, 2
    ), c{i + 1} AS (
        SELECT cell,
               array_agg(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
                              * ((2*abs(s) + n) // (2*n)) AS DOUBLE)
                         ORDER BY pos) AS cq
        FROM u{i} GROUP BY cell
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f""",
    sfin AS (
        SELECT x.vec_id, c.cell, {_S2J_D2Q} AS d2q
        FROM xq x CROSS JOIN c{_S2J_ITERS} c
    )
    SELECT vec_id, cell, d2q FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY d2q, cell
        ) AS rn FROM sfin
    ) WHERE rn = 1
"""
    )


@q("s2j_kmeans_lloyd_det", _s2j_oracle())
def s2j_kmeans_lloyd_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means — the TRAINING loop itself — in a deterministic,
    fully value-checked form (VERDICT r8 #6: the last unoracled stage
    of the ANN program).  {_S2J_ITERS} fixed update rounds from the
    modular-representative init over {_S2J_NLIST} cells: integer
    squared-distance assignment with lowest-cell tie-breaks (the s2e
    kernel), centroid update as round-half-away-from-zero integer
    ratios of exact component sums (the h23 ``div``-on-both-engines
    recipe), empty cells dropped identically on both engines.  Output
    is the final assignment under the post-iteration centroids — the
    oracle unrolls both iterations as CTEs (the g4/s29 trick) and
    matches bit-for-bit, so ONLY float-converged production KMeans
    (rows-only, recall-gated) remains untestable by value, by nature.
    Scale shape per iteration: centroids broadcast; the update shuffles
    map-side-combined (cell, pos) partial sums — partitions x nlist x
    dim cells, never the corpus."""
    from martech_pipelines_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.kmeans_lloyd_det(
        emb, nlist=_S2J_NLIST, iters=_S2J_ITERS
    ).select("vec_id", "cell", "d2q")


# ---------------------------------------------------------------------------
# s30: graph-ANN tuning curve — recall@5 vs hop budget (s25's counterpart
# for the graph index family)
# ---------------------------------------------------------------------------

_S30_HOPS = (1, 2, 3)


def _s30_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_r8b import _COS_QB

    blocks = [
        f"""base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), {_S29B_GRAPH_BLOCK}, qs AS (
        SELECT vec_id AS query_id, v FROM base WHERE vec_id % 10 = 0
    ), exact AS (
        SELECT query_id, node FROM (
            SELECT q.query_id, b.vec_id AS node, {_COS_QB} AS cos_sim,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_COS_QB} DESC, b.vec_id ASC
                   ) AS rn
            FROM qs q CROSS JOIN base b
            WHERE {_COS_QB} IS NOT NULL
        ) WHERE rn <= {_S29_K}
    ), f0 AS (
        SELECT q.query_id, e.node
        FROM qs q, (SELECT min(vec_id) AS node FROM base) e
    ), s0 AS (
        SELECT f.query_id, f.node, {_COS_QB} AS cos_sim
        FROM f0 f JOIN qs q USING (query_id) JOIN base b ON b.vec_id = f.node
        WHERE {_COS_QB} IS NOT NULL
    ), b0 AS (
        SELECT query_id, node FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, node ASC
            ) AS rn FROM s0
        ) WHERE rn <= {_S29_BEAM}
    )"""
    ]
    max_h = max(_S30_HOPS)
    for i in range(1, max_h + 1):
        blocks.append(
            f"""f{i} AS (
        SELECT query_id, node FROM b{i - 1}
        UNION
        SELECT p.query_id, g.nbr_id FROM b{i - 1} p JOIN g ON g.src_id = p.node
    ), s{i} AS (
        SELECT f.query_id, f.node, {_COS_QB} AS cos_sim
        FROM f{i} f JOIN qs q USING (query_id) JOIN base b ON b.vec_id = f.node
        WHERE {_COS_QB} IS NOT NULL
    ), b{i} AS (
        SELECT query_id, node FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, node ASC
            ) AS rn FROM s{i}
        ) WHERE rn <= {_S29_BEAM}
    )"""
        )
    rows = []
    for h in _S30_HOPS:
        united = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(h + 1))
        blocks.append(
            f"""top{h} AS (
        SELECT query_id, node FROM (
            SELECT query_id, node, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, node ASC
            ) AS rnk
            FROM (SELECT DISTINCT query_id, node, cos_sim FROM ({united}))
        ) WHERE rnk <= {_S29_K}
    )"""
        )
        rows.append(
            f"""SELECT CAST({h} AS BIGINT) AS hops,
           CAST(count(DISTINCT x.query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(a.node) AS BIGINT) AS hits,
           CAST((CAST(count(a.node) AS BIGINT) * 20000 + count(*))
                // (2 * count(*)) AS BIGINT) AS recall_e4
    FROM exact x LEFT JOIN top{h} a
      ON a.query_id = x.query_id AND a.node = x.node"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + "\n    "
        + "\n    UNION ALL\n    ".join(rows)
    )


@q("s30_graph_recall_curve", _s30_oracle())
def s30_graph_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph-ANN tuning curve: recall@5 of the PRODUCTION beam
    search (s29b — banded-LSH graph, fixed entry) as a function of the
    hop budget (1/2/3), against the exact ranker — s25's accuracy-vs-
    cost report re-read for the graph family, where the candidate
    budget grows with hops the way IVF's grows with nprobe.  Every
    stage is deterministic, so the whole curve is value-checked.

    Plan shape: the exact side runs ONCE through the Arrow map-side
    top-k twin (persisted |Q| x k rows); the graph side is ONE walk —
    visited sets are nested across hops, so per-hop snapshots reuse the
    same frontier scoring (``sweep_hops``, the s25 sweep-kernel
    discipline) instead of three independent searches.  Hits land in
    one inner join grouped by hops; the ratio is a half-up BIGINT e4."""
    from martech_pipelines_spark import caching
    from martech_pipelines_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = caching.register(
        SIM.brute_force_topk_arrow(queries, emb, k=_S29_K)
        .select("query_id", "vec_id")
        .persist()
    )
    graph = SIM.knn_graph_lsh(
        emb, dim=64, k=_S29_GK, bits=_S29B_BITS, bands=_S29B_BANDS
    ).select("src_id", "nbr_id")
    entry = emb.agg(F.min("vec_id")).collect()[0][0]  # 1-row control plane
    sweep = SIM.graph_ann_beam_search(
        queries,
        emb,
        graph,
        entry_id=entry,
        hops=max(_S30_HOPS),
        beam=_S29_BEAM,
        k=_S29_K,
        sweep_hops=list(_S30_HOPS),
    ).select("hops", "query_id", "vec_id")
    hits = (
        exact.join(sweep, ["query_id", "vec_id"])
        .groupBy("hops")
        .agg(F.count("*").cast("long").alias("hits"))
    )
    totals = exact.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    grid = spark.createDataFrame([(int(h),) for h in _S30_HOPS], "hops long")
    return (
        grid.crossJoin(F.broadcast(totals))
        .join(F.broadcast(hits), "hops", "left")
        .select(
            "hops",
            "n_queries",
            "n_pairs",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.expr(
                "(coalesce(hits, 0) * CAST(20000 AS BIGINT) + n_pairs)"
                " div (2 * n_pairs)"
            ).cast("long").alias("recall_e4"),
        )
    )


# ---------------------------------------------------------------------------
# r3c: deterministic KMV distinct sketch — the value-checkable twin of the
# rows-only HLL family (r3b/r31b/h7)
# ---------------------------------------------------------------------------

_R3C_K = 64
_KMV_M = 4_294_967_296

_R3C_ORACLE = f"""
    WITH hx AS (
        SELECT event_type,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               + 1 AS h
        FROM events GROUP BY 1, 2
    ), sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM hx
        ) WHERE rn <= {_R3C_K}
    ), est AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
               max(h) AS hk
        FROM sk GROUP BY 1
    ), ex AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT e.event_type, x.n_exact,
           CAST(CASE WHEN e.cnt < {_R3C_K} THEN e.cnt
                ELSE (2 * {_R3C_K - 1} * {_KMV_M} + e.hk) // (2 * e.hk)
                END AS BIGINT) AS kmv_est
    FROM est e JOIN ex x USING (event_type)
"""


@q("r3c_kmv_distinct_det", _R3C_ORACLE)
def r3c_kmv_distinct_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketching itself, value-checked: a KMV (k-minimum-
    values) distinct sketch of users per event type with md5-derived
    32-bit hashes — both engines compute IDENTICAL hashes, so the build
    (k smallest distinct hash values), the estimator ((k-1)/h_(k) as a
    half-up BIGINT) and the reported exact count all carry a full
    oracle.  This is the HLL family's r3b promotion: the production
    mergeable state stays datasketches HLL (rows-only, error/merge
    gates in pytest), while the SKETCH ALGORITHM class is now engine-
    exact — sketch(A∪B) == merge(sketch(A), sketch(B)) pinned in
    pytest.  Scale shape: distinct (type, h) collapses map-side, the
    rank<=k filter pushes down as WindowGroupLimit, the estimate reads
    k rows per key."""
    from martech_pipelines_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    sk = SK.kmv_sketch_table(ev, "event_type", "user_id", k=_R3C_K)
    est = SK.kmv_estimate(sk, "event_type", k=_R3C_K)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "kmv_est"
    )


@q("h24_incremental_kmv", _R3C_ORACLE)
def h24_incremental_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r3c maintained INCREMENTALLY (SHARES r3c's oracle — the IVM
    proof): the event log split at an integer-micros watermark into two
    batches, each reduced to its own KMV sketch, folded with
    ``kmv_merge`` — merge-of-sketches == sketch-of-union exactly (k
    smallest of a union = k smallest of the unions' k-smallest), so the
    estimate read off merged state must equal the full recompute
    bit-for-bit.  This is the distinct-count view-maintenance shape at
    100 TB: each batch shuffles only its pre-combined (key, hash) rows,
    history is never re-scanned; the HLL twin (h7) does the same with
    engine-specific sketches behind pytest gates.  (The n_exact column
    is the report's reference field, recomputed from the full log — the
    oracle anchor, not part of the maintained state.)"""
    from martech_pipelines_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    cut_us = 1705276800000000  # 2024-01-15T00:00:00Z (integer micros, tz-proof)
    b1 = ev.where(F.unix_micros("ts") < F.lit(cut_us))
    b2 = ev.where(F.unix_micros("ts") >= F.lit(cut_us))
    state = SK.kmv_sketch_table(b1, "event_type", "user_id", k=_R3C_K)
    state = SK.kmv_merge(
        state, SK.kmv_sketch_table(b2, "event_type", "user_id", k=_R3C_K),
        "event_type", k=_R3C_K,
    )
    est = SK.kmv_estimate(state, "event_type", k=_R3C_K)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_exact", "kmv_est"
    )


# ---------------------------------------------------------------------------
# g5: fixed-round min-label connected components (oracle-able CC twin)
# ---------------------------------------------------------------------------

_G5_ROUNDS = 3


def _g5_oracle() -> str:
    blocks = [
        """li AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), l0 AS (
        SELECT node, node AS lbl FROM nodes
    )"""
    ]
    for i in range(_G5_ROUNDS):
        blocks.append(
            f"""l{i + 1} AS (
        SELECT n.node,
               least(n.lbl, coalesce(m.minlbl, n.lbl)) AS lbl
        FROM l{i} n LEFT JOIN (
            SELECT e.dst AS node, min(l.lbl) AS minlbl
            FROM edges e JOIN l{i} l ON l.node = e.src
            GROUP BY 1
        ) m USING (node)
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"\n    SELECT node, lbl FROM l{_G5_ROUNDS}\n"
    )


@q("g5_cc_label_min", _g5_oracle())
def g5_cc_label_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components in its deterministic, value-checkable form:
    SYNC min-label propagation over the co-purchase graph for
    {_G5_ROUNDS} fixed rounds (the g4 discipline applied to the
    min-label rule) — each node ends with the smallest id within
    {_G5_ROUNDS} hops, the true component min wherever the diameter
    fits.  The fixpoint production loop (dedup clustering) stays
    convergence-checked in pytest; this twin unrolls into CTEs and
    carries a full oracle, completing the graph family's
    value-checked set (PageRank g1 / triangles g2 / LPA g4 / CC here).
    Per round: one keyed label-edge join + a map-side-combined min."""
    from martech_pipelines_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    return G.cc_label_min_rounds(edges, rounds=_G5_ROUNDS).select("node", "lbl")


# ---------------------------------------------------------------------------
# mart22: RFM quintile scoring (the classic martech segmentation)
# ---------------------------------------------------------------------------

_MART22_ORACLE = """
    WITH cust AS (
        SELECT o_custkey AS custkey,
               CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                              (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                    AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY 1
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cust),
    ranked AS (
        SELECT c.*,
               row_number() OVER (ORDER BY recency_days ASC, custkey ASC) AS rr,
               row_number() OVER (ORDER BY frequency ASC, custkey ASC) AS rf,
               row_number() OVER (ORDER BY monetary_cents ASC, custkey ASC) AS rm
        FROM cust c
    )
    SELECT custkey, recency_days, frequency, monetary_cents,
           CAST(5 - ((rr - 1) * 5) // n.n AS BIGINT) AS r_score,
           CAST(1 + ((rf - 1) * 5) // n.n AS BIGINT) AS f_score,
           CAST(1 + ((rm - 1) * 5) // n.n AS BIGINT) AS m_score,
           CAST((5 - ((rr - 1) * 5) // n.n) * 100
                + (1 + ((rf - 1) * 5) // n.n) * 10
                + (1 + ((rm - 1) * 5) // n.n) AS BIGINT) AS rfm_cell
    FROM ranked, n
"""


def _rfm_scores(cust: DataFrame) -> DataFrame:
    """Shared RFM scoring tail (mart22 + its IVM twin h25): rank-free
    quintile ranks (histogram cum-prev + keyed within-tie row_number)
    over a (custkey, recency_days, frequency, monetary_cents) frame.

    The value histogram is NOT a bounded spine — monetary cents are
    near-distinct per customer, so it grows with the data (the round-10
    spine audit flagged the old single-partition histogram window).
    The cumulative count therefore runs as the two-phase ranged scan,
    and the histogram joins back KEYED on the metric (no broadcast
    hint: a customer-scale build side must not be broadcast; AQE still
    broadcasts the genuinely small recency/frequency histograms)."""
    from pyspark.sql import Window

    from martech_pipelines_spark.operators.scan import ranged_cumsum

    n = cust.count()  # 1-scalar control plane (quintile denominator)

    def rank_col(df: DataFrame, metric: str, out: str) -> DataFrame:
        hist = df.groupBy(metric).agg(F.count("*").alias("__c"))
        hist = ranged_cumsum(
            hist, [F.asc(metric)], F.col("__c"), "__cum_incl"
        ).select(
            metric, (F.col("__cum_incl") - F.col("__c")).alias("__cum_prev")
        )
        within = F.row_number().over(
            Window.partitionBy(metric).orderBy(F.asc("custkey"))
        )
        return (
            df.withColumn("__within", within)
            .join(hist, metric)
            .withColumn(out, F.col("__cum_prev") + F.col("__within"))
            .drop("__within", "__cum_prev")
        )

    ranked = rank_col(cust, "recency_days", "__rr")
    ranked = rank_col(ranked, "frequency", "__rf")
    ranked = rank_col(ranked, "monetary_cents", "__rm")
    r_s = F.expr(f"5 - ((__rr - 1) * 5) div {n}")
    f_s = F.expr(f"1 + ((__rf - 1) * 5) div {n}")
    m_s = F.expr(f"1 + ((__rm - 1) * 5) div {n}")
    return ranked.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        r_s.cast("long").alias("r_score"),
        f_s.cast("long").alias("f_score"),
        m_s.cast("long").alias("m_score"),
        (r_s * 100 + f_s * 10 + m_s).cast("long").alias("rfm_cell"),
    )


def _rfm_cust_from_state(state: DataFrame) -> DataFrame:
    """Derive the (custkey, recency_days, frequency, monetary_cents)
    frame from mergeable per-customer state (last order date / order
    count / cents total) — the anchor is the state-wide max last date,
    identical to the full recompute's."""
    anchor = state.agg(F.max("__last").alias("__anchor"))
    return state.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        F.datediff(F.col("__anchor"), F.col("__last"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )


def _rfm_state(orders: DataFrame) -> DataFrame:
    """Per-customer mergeable RFM state from an order batch: max last
    order date, additive count, additive half-up cents total."""
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("__last"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("monetary_cents"),
    )


def _rfm_merge_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two RFM state tables: max/sum/sum per customer."""
    return (
        a.unionByName(b)
        .groupBy("custkey")
        .agg(
            F.max("__last").alias("__last"),
            F.sum("frequency").cast("long").alias("frequency"),
            F.sum("monetary_cents").cast("long").alias("monetary_cents"),
        )
    )


@q("mart22_rfm_scores", _MART22_ORACLE)
def mart22_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — THE classic martech scoring model the
    reference's CRM exports feed (recency / frequency / monetary
    quintiles per customer): recency in integer days against the
    dataset's own max order date (data-derived anchor, no wall-clock),
    monetary as exact half-up order cents, every quintile boundary an
    integer expression ``((rank-1)*5) div n`` over a totally tie-broken
    row_number — engine-exact end to end, no percentile convention in
    the comparison.  Scale shape (the h23 rank-free discipline — a
    global ``row_number() OVER (ORDER BY metric)`` would single-
    partition-sort every customer): per metric, rank = cumulative count
    of SMALLER metric values (one window over the |distinct values|
    histogram) + a within-tie row_number PARTITIONED by the metric
    value (a keyed window) — identical to the totally tie-broken global
    rank, with the only unpartitioned pass over the tiny histogram."""
    orders = load_table(spark, sf_dir, "orders")
    return _rfm_scores(_rfm_cust_from_state(_rfm_state(orders)))


# ---------------------------------------------------------------------------
# dq13: feed-distribution drift across a time split (did the source change?)
# ---------------------------------------------------------------------------

_DQ13_CUT_US = 1705276800000000  # 2024-01-15T00:00:00Z (integer micros)

_DQ13_ORACLE = f"""
    WITH ev AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) < {_DQ13_CUT_US} THEN 0 ELSE 1 END AS half,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), agg AS (
        SELECT event_type,
               CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN half = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_a,
               CAST(sum(CASE WHEN half = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_b
        FROM ev GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS t_a, CAST(sum(n_b) AS BIGINT) AS t_b
        FROM agg
    )
    SELECT a.event_type, a.n_a, a.n_b,
           CAST((a.n_a * 2000000 + t.t_a) // (2 * t.t_a) AS BIGINT) AS share_a_e6,
           CAST((a.n_b * 2000000 + t.t_b) // (2 * t.t_b) AS BIGINT) AS share_b_e6,
           CAST(abs((a.n_a * 2000000 + t.t_a) // (2 * t.t_a)
                    - (a.n_b * 2000000 + t.t_b) // (2 * t.t_b))
                AS BIGINT) AS share_drift_e6,
           CAST(CASE WHEN a.n_a > 0
                THEN (2 * a.s_a + a.n_a) // (2 * a.n_a) END AS BIGINT) AS mean_a_cents,
           CAST(CASE WHEN a.n_b > 0
                THEN (2 * a.s_b + a.n_b) // (2 * a.n_b) END AS BIGINT) AS mean_b_cents
    FROM agg a, tot t
"""


@q("dq13_feed_drift", _DQ13_ORACLE)
def dq13_feed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-distribution drift monitor — the "did the upstream source
    change?" check that catches silent schema-preserving regressions
    (a partner swaps SDKs, a type's volume share or value scale moves):
    the event log split at an integer-micros watermark, per event type
    the count SHARE of each half (half-up e6 against the half's total)
    plus its share drift, and the mean value in half-up cents — all
    exact integer arithmetic, one map-side-combined agg over the log
    and a 1-row totals broadcast.  Complements dq2 (time-series
    z-score), dq4 (freshness), dq12 (cross-table ordering): this one
    compares POPULATIONS across the split, not points on a curve."""
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.unix_micros("ts") < F.lit(_DQ13_CUT_US), F.lit(0)
    ).otherwise(F.lit(1))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    agg = (
        ev.select("event_type", half.alias("__half"), cents.alias("__cents"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("__half") == 0, 1).otherwise(0))
            .cast("long").alias("n_a"),
            F.sum(F.when(F.col("__half") == 1, 1).otherwise(0))
            .cast("long").alias("n_b"),
            F.sum(F.when(F.col("__half") == 0, F.col("__cents")).otherwise(0))
            .cast("long").alias("__s_a"),
            F.sum(F.when(F.col("__half") == 1, F.col("__cents")).otherwise(0))
            .cast("long").alias("__s_b"),
        )
    )
    tot = agg.agg(
        F.sum("n_a").cast("long").alias("__t_a"),
        F.sum("n_b").cast("long").alias("__t_b"),
    )
    j = agg.crossJoin(F.broadcast(tot))
    share_a = F.expr("(n_a * CAST(2000000 AS BIGINT) + __t_a) div (2 * __t_a)")
    share_b = F.expr("(n_b * CAST(2000000 AS BIGINT) + __t_b) div (2 * __t_b)")
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        share_a.cast("long").alias("share_a_e6"),
        share_b.cast("long").alias("share_b_e6"),
        F.abs(share_a - share_b).cast("long").alias("share_drift_e6"),
        F.when(F.col("n_a") > 0, F.expr("(2 * __s_a + n_a) div (2 * n_a)"))
        .cast("long").alias("mean_a_cents"),
        F.when(F.col("n_b") > 0, F.expr("(2 * __s_b + n_b) div (2 * n_b)"))
        .cast("long").alias("mean_b_cents"),
    )


# ---------------------------------------------------------------------------
# dd19: MinHash estimator-accuracy report (completes the index-quality suite)
# ---------------------------------------------------------------------------


def _dd19_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_extended import (
        _DUCK_NORM,
        _DUCK_TOKENS,
        _MINHASH_CORPUS_SQL,
    )

    toks = _DUCK_TOKENS.format(col=_DUCK_NORM.format(col="text"))
    perm_mins = ",\n               ".join(
        "list_min(list_transform(sh, s -> ('0x' || substr(md5('{i}:' || s), 1, 8))::BIGINT)) AS m{i}".format(i=i)
        for i in range(16)
    )
    bands = "\n        UNION ALL\n".join(
        """        SELECT doc_id, {b} AS band,
               md5(m{j0}::VARCHAR || '|' || m{j1}::VARCHAR || '|' || m{j2}::VARCHAR || '|' || m{j3}::VARCHAR) AS bk
        FROM sigs""".format(b=b, j0=4 * b, j1=4 * b + 1, j2=4 * b + 2, j3=4 * b + 3)
        for b in range(4)
    )
    matches = " + ".join(
        f"(CASE WHEN ga.m{i} = gb.m{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    return f"""
    WITH corpus AS (
{_MINHASH_CORPUS_SQL}
    ), toksrc AS (
        SELECT doc_id, {toks} AS t FROM corpus
    ), shs AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 3
                   THEN list_transform(generate_series(1, len(t) - 2),
                                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sh
        FROM toksrc
    ), sigs AS (
        SELECT doc_id,
               {perm_mins}
        FROM shs WHERE len(sh) > 0
    ), bands AS (
{bands}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    ), scored AS (
        SELECT c.id_a, c.id_b,
               CASE WHEN (len(sa.sh) + len(sb.sh)
                          - len(list_intersect(sa.sh, sb.sh))) > 0
                    THEN (CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 20000
                          + (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
                         // (2 * (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))))
                    ELSE 0 END AS jacc_e4,
               (CAST({matches} AS BIGINT) * 20000 + 16) // 32 AS est_e4
        FROM cand c
        JOIN shs sa ON sa.doc_id = c.id_a
        JOIN shs sb ON sb.doc_id = c.id_b
        JOIN sigs ga ON ga.doc_id = c.id_a
        JOIN sigs gb ON gb.doc_id = c.id_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST((2 * sum(jacc_e4) + count(*)) // (2 * count(*)) AS BIGINT)
               AS mean_jacc_e4,
           CAST((2 * sum(est_e4) + count(*)) // (2 * count(*)) AS BIGINT)
               AS mean_est_e4,
           CAST((2 * sum(abs(est_e4 - jacc_e4)) + count(*)) // (2 * count(*))
                AS BIGINT) AS mae_e4,
           CAST(max(abs(est_e4 - jacc_e4)) AS BIGINT) AS max_ae_e4
    FROM scored
    """


@q("dd19_minhash_estimator_accuracy", _dd19_oracle())
def dd19_minhash_estimator_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-accuracy report closing the dedup-index quality suite
    (s19 recall / s23 distortion / dd16 blocking precision / THIS —
    estimator calibration): over all banded candidate pairs, the
    per-pair MinHash Jaccard ESTIMATE (matching signature slots / 16 as
    a half-up e4) against the EXACT shingle Jaccard (same e4 recipe),
    reported as mean-exact, mean-estimate, MAE, and max error — the
    number that says whether 16 permutations are enough for the dedup
    threshold in use (expected sd ~ sqrt(J(1-J)/16) ~ 0.125 at J=0.5).
    Same corpus, signatures, and banding as dd3 (md5 arithmetic is
    engine-portable, so the whole report carries a full oracle); one
    skinny pair join + a 1-row aggregate."""
    from martech_pipelines_spark.operators import dedup as DD
    from martech_pipelines_spark.operators.dedup import minhash_signature, shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = base.unionByName(near)
    cand = DD.lsh_candidate_pairs(corpus, num_perm=16, bands=4, shingle_n=3)
    sh = corpus.select(
        "doc_id",
        shingles(F.col("text"), 3).alias("sh"),
        minhash_signature(F.col("text"), 16, 3).alias("sig"),
    ).where(F.size("sh") > 0)
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    un = (F.size("sh_a") + F.size("sh_b")).cast("long") - inter
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.when(
                un > 0,
                (inter * 20000 + un).cast("long"),
            ).otherwise(F.lit(0)).alias("__num"),
            un.alias("__un"),
            matches.alias("__m"),
        )
        .select(
            F.when(
                F.col("__un") > 0, F.expr("__num div (2 * __un)")
            ).otherwise(F.lit(0)).cast("long").alias("jacc_e4"),
            F.expr("(__m * 20000 + 16) div 32").cast("long").alias("est_e4"),
        )
    )
    n = F.count("*")
    return scored.agg(
        n.cast("long").alias("n_pairs"),
        F.expr("(2 * sum(jacc_e4) + count(*)) div (2 * count(*))")
        .cast("long").alias("mean_jacc_e4"),
        F.expr("(2 * sum(est_e4) + count(*)) div (2 * count(*))")
        .cast("long").alias("mean_est_e4"),
        F.expr(
            "(2 * sum(abs(est_e4 - jacc_e4)) + count(*)) div (2 * count(*))"
        ).cast("long").alias("mae_e4"),
        F.max(F.abs(F.col("est_e4") - F.col("jacc_e4")))
        .cast("long").alias("max_ae_e4"),
    )


@q("h25_incremental_rfm", _MART22_ORACLE)
def h25_incremental_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart22 maintained INCREMENTALLY (SHARES mart22's oracle — the
    IVM proof): the order log split at an integer-micros watermark into
    two batches, each reduced to per-customer mergeable RFM state (max
    last-order date / additive count / additive half-up cents), folded
    with ``_rfm_merge_state`` — later data folded FIRST so the second
    fold's earlier orders must shift recency/frequency correctly (the
    h10 hard-IVM convention).  Quintile scores recomputed from merged
    state must equal the full recompute bit-for-bit.  Nightly segment
    refresh shape: each batch shuffles one keyed agg of its own orders;
    history is never re-scanned, and the scoring tail reads only the
    customer-sized state."""
    orders = load_table(spark, sf_dir, "orders")
    cut_us = 1718409600000000  # 2024-06-15T00:00:00Z (integer micros)
    b1 = orders.where(F.unix_micros("o_orderdate") < F.lit(cut_us))
    b2 = orders.where(F.unix_micros("o_orderdate") >= F.lit(cut_us))
    state = _rfm_state(b2)            # later data first (hard IVM case)
    state = _rfm_merge_state(state, _rfm_state(b1))
    return _rfm_scores(_rfm_cust_from_state(state))
