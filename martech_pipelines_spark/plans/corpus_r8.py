"""Round-8 corpus additions (queued for the ROUND-9 driver window —
round 8's 50 slots are fully committed to draining the backlog).

``s20_mmr_rerank``      — Maximal-Marginal-Relevance diversification
                          re-rank over a deterministic quantized-IP
                          candidate set: the post-retrieval stage that
                          keeps top-k results from being k near-copies.
                          The greedy loop is an Arrow kernel; the
                          oracle replays it as k chained CTE steps.
``dq9_fd_profile``      — functional-dependency profiling (does
                          source determine lang?): per-source language
                          cardinality + dominant-language share, the
                          mixed-language-source monitor every corpus
                          intake runs.  Naturally violated on the
                          testdata (every source carries 5 langs), so
                          the check is non-trivial.
``r37_rank_distribution`` — percent_rank / cume_dist window classics
                          (the two rank-normalizations feature prep
                          uses for rank-gauss style transforms).
``t45_containment_dedup`` — asymmetric n-gram CONTAINMENT (Broder 97):
                          the doc-in-doc detector; a snippet embedded
                          in a larger doc scores ~1 containment while
                          Jaccard reads only |A|/|B|.  Emitted next to
                          Jaccard as half-up BIGINT e4 ratios.

Reference scope: the reference engine's dedup/search tasks motivate the
family (SURVEY.md §2 north-star extensions); all four are engine-exact
(integer comparisons / single-rounded divisions only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


# ---------------------------------------------------------------------------
# s20: MMR diversification re-rank
# ---------------------------------------------------------------------------


def _s20_oracle(n_cand: int = 10, k: int = 5) -> str:
    """The greedy MMR loop unrolled into k chained CTE steps: step N
    scores every not-yet-selected candidate as rel - max(sim to the
    selected set) and picks the (score DESC, vec_id ASC) winner —
    integer arithmetic end to end, so DuckDB replays the Spark kernel's
    selection order exactly."""
    steps = []
    for n in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT query_id, p{j} AS v FROM s{j}" for j in range(1, n)
        )
        steps.append(f"sel{n} AS ({prev})")
        steps.append(
            f"""s{n} AS (
        SELECT query_id, vec_id AS p{n}, sc AS sc{n} FROM (
            SELECT query_id, vec_id, sc, row_number() OVER (
                PARTITION BY query_id ORDER BY sc DESC, vec_id) AS rn
            FROM (
                SELECT c.query_id, c.vec_id, c.rel - max(p.sim) AS sc
                FROM cand c
                JOIN pairs p ON p.query_id = c.query_id AND p.a = c.vec_id
                JOIN sel{n} s ON s.query_id = p.query_id AND s.v = p.b
                WHERE NOT EXISTS (
                    SELECT 1 FROM sel{n} x
                    WHERE x.query_id = c.query_id AND x.v = c.vec_id)
                GROUP BY c.query_id, c.vec_id, c.rel
            )
        ) WHERE rn = 1
    )"""
        )
    finals = ["""SELECT query_id, p1 AS vec_id, CAST(1 AS BIGINT) AS mmr_rank,
           sc1 AS mmr_score FROM s1"""]
    finals += [
        f"SELECT query_id, p{n}, CAST({n} AS BIGINT), sc{n} FROM s{n}"
        for n in range(2, k + 1)
    ]
    return f"""
    WITH qz AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)) AS v
        FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id,
               CAST(list_dot_product(q.v, c.v) AS BIGINT) AS rel
        FROM qz q CROSS JOIN qz c
        WHERE q.vec_id % 10 = 0
    ), cand AS (
        SELECT query_id, vec_id, rel, rn FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
            FROM scored) WHERE rn <= {n_cand}
    ), pairs AS (
        SELECT a.query_id, a.vec_id AS a, b.vec_id AS b,
               CAST(list_dot_product(za.v, zb.v) AS BIGINT) AS sim
        FROM cand a
        JOIN cand b ON b.query_id = a.query_id AND b.vec_id != a.vec_id
        JOIN qz za ON za.vec_id = a.vec_id
        JOIN qz zb ON zb.vec_id = b.vec_id
    ), s1 AS (
        SELECT query_id, vec_id AS p1, rel AS sc1 FROM cand WHERE rn = 1
    ),
    {", ".join(steps)}
    {" UNION ALL ".join(finals)}
    """


@q("s20_mmr_rerank", _s20_oracle())
def s20_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 from a quantized-inner-product top-10
    candidate set (lambda = 0.5 integer form: score = rel - max sim to
    the already-selected set, lowest-vec_id tie-break).  Candidate
    generation is the s1 broadcast shape; the re-rank exchanges only
    |Q| x 100 integer rows and runs the greedy loop per query in an
    int64 Arrow kernel — see operators/similarity.py:mmr_rerank for the
    why-a-kernel justification (each step's scores depend on the
    previous pick; no fixed expression tree exists)."""
    from martech_pipelines_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.mmr_rerank(queries, emb, n_candidates=10, k=5).select(
        "query_id", "vec_id", "mmr_rank", "mmr_score"
    )


# ---------------------------------------------------------------------------
# dq9: functional-dependency profile (source -> lang?)
# ---------------------------------------------------------------------------


@q(
    "dq9_fd_profile",
    """
    WITH cnt AS (
        SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ), top AS (
        SELECT source, lang AS top_lang, n AS top_n FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY n DESC, lang) AS rn
            FROM cnt) WHERE rn = 1
    ), tot AS (
        SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs
        FROM documents GROUP BY 1
    )
    SELECT t.source, t.n_docs, t.n_langs, p.top_lang,
           CAST((p.top_n * 20000 + t.n_docs) // (2 * t.n_docs) AS BIGINT)
               AS top_share_e4
    FROM tot t JOIN top p USING (source)
    """,
)
def dq9_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does ``source`` functionally determine ``lang``?  Per source:
    doc count, distinct-language cardinality, the dominant language
    (mode, lowest-lang tie-break) and its share as a half-up BIGINT e4
    ratio — the mixed-language-source monitor that decides whether a
    source can be routed by metadata or must be language-ID'd per doc.
    Two map-side-combined aggs + one broadcast-sized join; scales with
    |sources|, not |docs|."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.col("lang"))
    top = (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("n").alias("top_n"))
    )
    tot = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return tot.join(top, "source").select(
        "source",
        "n_docs",
        "n_langs",
        "top_lang",
        F.expr("(top_n * 20000L + n_docs) div (2L * n_docs)").alias("top_share_e4"),
    )


# ---------------------------------------------------------------------------
# r37: percent_rank / cume_dist window classics
# ---------------------------------------------------------------------------


@q(
    "r37_rank_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def r37_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per market segment ordered by account
    balance — the rank-normalization pair feature prep uses (rank-gauss
    etc.).  The ORDER BY includes c_custkey so ranks are total and both
    values are single correctly-rounded divisions of exact integers —
    engine-identical without rounding.  One window pass."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# ---------------------------------------------------------------------------
# t45: asymmetric containment (doc-in-doc dedup)
# ---------------------------------------------------------------------------


def _t45_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_extended import (
        _DUCK_NORM,
        _DUCK_TOKENS,
    )

    toks = _DUCK_TOKENS.format(col=_DUCK_NORM.format(col="text"))
    inter = "len(list_intersect(sa.sh, sb.sh))"
    na = "len(sa.sh)"
    union = f"(len(sa.sh) + len(sb.sh) - {inter})"
    return f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 3000000,
               substr(text, 1, CAST(n_chars // 2 AS INTEGER))
        FROM documents WHERE doc_id % 7 = 0
    ), toksrc AS (
        SELECT doc_id, {toks} AS t FROM corpus
    ), shs AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 3
                   THEN list_transform(generate_series(1, len(t) - 2),
                                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sh
        FROM toksrc
    ), p AS (
        SELECT doc_id + 3000000 AS id_a, doc_id AS id_b
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT p.id_a, p.id_b,
           CASE WHEN {na} > 0
                THEN CAST(({inter} * 20000 + {na}) // (2 * {na}) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS containment_e4,
           CASE WHEN {union} > 0
                THEN CAST(({inter} * 20000 + {union}) // (2 * {union}) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS jaccard_e4
    FROM p
    JOIN shs sa ON sa.doc_id = p.id_a
    JOIN shs sb ON sb.doc_id = p.id_b
    """


@q("t45_containment_dedup", _t45_oracle())
def t45_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment vs Jaccard on snippet-in-document pairs: every 7th
    doc contributes its first-half prefix as a synthetic snippet; the
    snippet's 3-gram containment in its source reads ~1e4 while Jaccard
    reads ~|A|/|B| — the quote/excerpt/boilerplate-wrap case threshold-
    on-Jaccard dedup misses.  Both metrics as half-up BIGINT e4 ratios
    (no double division).  Physical shape = jaccard_on_pairs: the pair
    table joins per-doc shingle sets twice (LSH provides the pair table
    at scale; the aligned pairs here isolate the verify kernel)."""
    from martech_pipelines_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    snippets = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.expr("substring(text, 1, CAST(n_chars div 2 AS INT))").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(snippets)
    pairs = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 3000000).alias("id_a"),
        F.col("doc_id").alias("id_b"),
    )
    return DD.containment_on_pairs(pairs, corpus, shingle_n=3)


# ---------------------------------------------------------------------------
# s2h2: AS-OF (time-travel) probe of the materialized IVF lifecycle
# ---------------------------------------------------------------------------

# Build-once-per-process cache (the s2h/pipe10b convention): base index
# from the day-0 snapshot, batch 0 = the later-arrivals delta (same
# split as s2h), batch 1 = a NOISE batch of id-shifted duplicate
# vectors that WOULD change the top-k if read.  The query probes
# as_of=0, so its answer must equal s2g's whole-corpus oracle verbatim
# — the driver value-checks that time travel excludes exactly the
# post-pin batch.
_S2H2_INDEX: dict[str, str] = {}


def _s2h2_index(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    from martech_pipelines_spark.operators import similarity as SIM
    from martech_pipelines_spark.plans.corpus_r7 import _NLIST

    path = _S2H2_INDEX.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="ivf_asof_idx_")
        emb = load_table(spark, sf_dir, "embeddings")
        delta_pred = (F.col("vec_id") % 5 == 4) & (F.col("vec_id") >= _NLIST)
        SIM.ivf_det_build_index(emb.where(~delta_pred), path, nlist=_NLIST)
        SIM.ivf_det_append_batch(emb.where(delta_pred), 0, path)
        # batch 1: duplicate vectors under shifted ids — if the as-of
        # read leaked them, they would tie-beat nothing but ADD rows at
        # identical cosines with LOWER... higher ids; shift by +10^7 so
        # any leak changes vec_id sets (and therefore the value hash)
        noise = emb.where(F.col("vec_id") % 7 == 3).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        SIM.ivf_det_append_batch(noise, 1, path)
        _S2H2_INDEX[sf_dir] = path
    return path


@q("s2h2_ivf_asof_probe", ORACLE["s2g_ivf_deterministic_topk"])  # SHARES s2g's
def s2h2_ivf_asof_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel probe of the materialized deterministic IVF index:
    the index holds base + batch 0 (= s2h's corpus) + a batch-1 NOISE
    append of duplicate vectors under shifted ids; probing ``as_of=0``
    must reproduce the index as it stood when batch 0 landed — i.e.
    equal s2g's whole-corpus oracle bit-for-bit, with the noise batch
    invisible.  This is the reproducible-training-run read
    (sinks.read_batched_index / _read_ivf_corpus as_of): pin the ingest
    batch a run indexed against and its probes replay exactly; reads
    below a compaction horizon raise instead of silently answering with
    folded state.  The as-of filter rides the ``batch`` partition
    column — pruned, not scanned-and-dropped."""
    from martech_pipelines_spark.operators import similarity as SIM
    from martech_pipelines_spark.plans.corpus_r7 import _NPROBE

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_det_probe_topk(
        queries, _s2h2_index(spark, sf_dir), k=5, nprobe=_NPROBE, as_of=0
    ).select("query_id", "vec_id", "cos_sim", "rnk")


# ---------------------------------------------------------------------------
# fe4: leakage-safe leave-one-out target encoding
# ---------------------------------------------------------------------------


@q(
    "fe4_target_encoding",
    """
    WITH cents AS (
        SELECT c_custkey, c_mktsegment,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS p
        FROM customer
    ), seg AS (
        SELECT c_custkey, c_mktsegment, p,
               CAST(sum(p) OVER w AS BIGINT) AS s1,
               count(*) OVER w AS n
        FROM cents
        WINDOW w AS (PARTITION BY c_mktsegment)
    )
    SELECT c_custkey, c_mktsegment,
           CASE WHEN n > 1 THEN
               CAST(s1 - p AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0
           END AS loo_mean
    FROM seg
    """,
)
def fe4_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe LEAVE-ONE-OUT target encoding (the feature-prep
    classic): each row's categorical feature value is the mean target of
    its category EXCLUDING the row itself — (sum - y_i)/(n - 1) — so the
    encoded feature never carries the row's own label (the pipe4
    leakage discipline applied to feature construction; a plain
    category mean leaks the target and inflates validation metrics).
    Engine-exact: integer-cent sums per category (one window pass, no
    join-back), then a fixed tree of single-rounded double ops;
    singleton categories yield NULL (no prior blending — callers choose
    their own fallback).  Scale: one hash exchange on the category."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    p = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    s1 = F.sum(p).over(w)
    n = F.count(F.lit(1)).over(w)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            n > 1,
            (s1 - p).cast("double") / (n - 1).cast("double") / F.lit(100.0),
        ).alias("loo_mean"),
    )


# ---------------------------------------------------------------------------
# t46: token-budget allocation from temperature-reweighted mixture weights
# ---------------------------------------------------------------------------


def _t46_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_extended import _DUCK_TOKENS

    toks = _DUCK_TOKENS.format(col="text")
    return f"""
    WITH per_source AS (
        SELECT source,
               CAST(sum(len({toks})) AS BIGINT) AS avail_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(avail_tokens) AS BIGINT) AS all_tokens
        FROM per_source
    ), weighted AS (
        -- alpha=0.5 temperature weight as an e4 integer: sqrt of the
        -- half-up e4 token share, floored back to e4 (integer-exact:
        -- isqrt of share_e4 * 1e4)
        SELECT source, avail_tokens, all_tokens,
               CAST(floor(sqrt(CAST(
                   ((avail_tokens * 20000 + all_tokens)
                    // (2 * all_tokens)) * 10000 AS DOUBLE))) AS BIGINT)
                   AS w_e4
        FROM per_source CROSS JOIN tot
    ), norm AS (
        SELECT CAST(sum(w_e4) AS BIGINT) AS sum_w FROM weighted
    )
    SELECT source, avail_tokens, w_e4,
           CAST(least(avail_tokens,
                      (all_tokens // 5) * w_e4 // sum_w) AS BIGINT)
               AS alloc_tokens,
           (all_tokens // 5) * w_e4 // sum_w > avail_tokens AS capped
    FROM weighted CROSS JOIN norm
    """


@q("t46_mixture_budget", _t46_oracle())
def t46_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture-design -> sampling-plan bridge: given a token budget
    (20% of the corpus) and t16's alpha=0.5 temperature weights, the
    per-source token allocation = budget * w / sum(w), capped at the
    source's available tokens, with an oversubscription flag (a capped
    source means the sampler must upweight the rest or accept a smaller
    epoch — the decision this report exists to surface).  Integer-exact
    end to end: half-up e4 token shares, isqrt-floored e4 temperature
    weights (sqrt of an exact integer — both engines' sqrt is correctly
    rounded, floor makes the fraction-digit cut exact), integer
    budget division.  Two map-side-combined aggs + two broadcast
    scalars; scales with |sources|."""
    from martech_pipelines_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text")).cast("long")).alias("avail_tokens")
    )
    tot = per.agg(F.sum("avail_tokens").alias("all_tokens"))
    weighted = per.crossJoin(F.broadcast(tot)).withColumn(
        "w_e4",
        F.floor(
            F.sqrt(
                (
                    F.expr(
                        "(avail_tokens * 20000L + all_tokens)"
                        " div (2L * all_tokens)"
                    )
                    * F.lit(10000)
                ).cast("double")
            )
        ).cast("long"),
    )
    norm = weighted.agg(F.sum("w_e4").alias("sum_w"))
    alloc = F.expr("(all_tokens div 5L) * w_e4 div sum_w")
    return (
        weighted.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "avail_tokens",
            "w_e4",
            F.least(F.col("avail_tokens"), alloc).alias("alloc_tokens"),
            (alloc > F.col("avail_tokens")).alias("capped"),
        )
    )


# ---------------------------------------------------------------------------
# s23: PQ quantization-distortion report (per-subspace)
# ---------------------------------------------------------------------------


def _s23_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_r7 import _S8B_ORACLE

    return f"""
    WITH codes AS ({_S8B_ORACLE})
    SELECT subspace,
           count(*) AS n_vecs,
           CAST(sum(d2q) AS BIGINT) AS total_d2q,
           CAST(sum(d2q) // count(*) AS BIGINT) AS mean_d2q,
           CAST(max(d2q) AS BIGINT) AS max_d2q
    FROM codes GROUP BY subspace
    """


@q("s23_pq_distortion_report", _s23_oracle())
def s23_pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer-quality diagnostic: per PQ subspace, the count, total,
    floored mean and max of the exact integer reconstruction distance
    between each vector's slice and its assigned codeword (s8b's d2q
    aggregated) — the under-fitted-subspace report that decides where a
    PQ codebook needs more centroids or an OPQ rotation, the distortion
    counterpart of s19's recall report.  m output rows; one keyed agg
    over the code table (map-side combined), codebook broadcast —
    at 100 TB this reads the stored codes' d2q column, never re-scores.
    Integer-exact end to end (s8b's quantized distances; floor mean)."""
    from martech_pipelines_spark.operators import similarity as SIM
    from martech_pipelines_spark.plans.corpus_r7 import _NLIST, _PQ_M

    emb = load_table(spark, sf_dir, "embeddings")
    cb = SIM.modular_pq_codebook(emb, m=_PQ_M, ksub=_NLIST, dim=64)
    codes = SIM.quantized_pq_codes(emb, cb, m=_PQ_M, dim=64)
    return codes.groupBy("subspace").agg(
        F.count("*").alias("n_vecs"),
        F.sum("d2q").alias("total_d2q"),
        F.expr("sum(d2q) div count(*)").alias("mean_d2q"),
        F.max("d2q").alias("max_d2q"),
    )


# ---------------------------------------------------------------------------
# dq10: anomaly attribution — top contributors to each flagged day
# ---------------------------------------------------------------------------


def _dq10_oracle() -> str:
    from martech_pipelines_spark.plans.corpus import ORACLE as _OR

    dq2 = _OR["dq2_rolling_zscore"]
    return f"""
    WITH dq2 AS ({dq2}),
    flagged AS (
        SELECT event_type, day_str,
               CAST(floor(v * 100 + 0.5) AS BIGINT) AS day_paise
        FROM dq2 WHERE anomaly
    ),
    user_day AS (
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_str,
               user_id,
               CAST(floor(round(sum(value), 2) * 100 + 0.5) AS BIGINT)
                   AS user_paise
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day_str, user_id, user_paise,
           CAST((user_paise * 20000 + day_paise)
                // (2 * day_paise) AS BIGINT) AS share_e4,
           rnk
    FROM (
        SELECT f.event_type, f.day_str, u.user_id, u.user_paise,
               f.day_paise,
               row_number() OVER (
                   PARTITION BY f.event_type, f.day_str
                   ORDER BY u.user_paise DESC, u.user_id
               ) AS rnk
        FROM flagged f
        JOIN user_day u
          ON u.event_type = f.event_type AND u.day_str = f.day_str
    ) WHERE rnk <= 5
    """


@q("dq10_anomaly_attribution", _dq10_oracle())
def dq10_anomaly_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-cause drill-down for the dq2 monitor: for every flagged
    (event_type, day), the top-5 contributing users by that day's value
    sum, with each user's half-up e4 share of the day — the first
    question an on-call asks after an anomaly alert ("one whale or a
    broad shift?").  The flagged-day table is tiny (anomalies by
    construction), so the join BROADCASTS it against per-user day sums
    and only flagged days' users survive the join — at 100 TB the
    drill-down never materializes the full user-day matrix beyond one
    map-side-combined aggregation.  Integer-cent arithmetic and a total
    (paise DESC, user_id) order keep the cut engine-exact."""
    from martech_pipelines_spark.operators import transforms as TR

    ev = load_table(spark, sf_dir, "events")
    z = TR.rolling_zscore(ev, "event_type", "ts", "value", window_periods=7)
    flagged = z.where("anomaly").select(
        "event_type",
        F.date_format("period", "yyyy-MM-dd").alias("day_str"),
        F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long").alias("day_paise"),
    )
    user_day = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_str"),
        "user_id",
    ).agg(
        F.floor(F.round(F.sum("value"), 2) * 100 + F.lit(0.5))
        .cast("long")
        .alias("user_paise")
    )
    joined = user_day.join(F.broadcast(flagged), ["event_type", "day_str"])
    w = Window.partitionBy("event_type", "day_str").orderBy(
        F.desc("user_paise"), F.col("user_id")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select(
            "event_type",
            "day_str",
            "user_id",
            "user_paise",
            F.expr("(user_paise * 20000L + day_paise) div (2L * day_paise)")
            .alias("share_e4"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# dd16: LSH blocking-precision report (index-quality trilogy closer)
# ---------------------------------------------------------------------------


def _dd16_oracle() -> str:
    from martech_pipelines_spark.plans.corpus_extended import _minhash_oracle

    inner = _minhash_oracle()
    marker = "WHERE jaccard >= 0.5"
    assert inner.rstrip().endswith(marker), (
        "dd3's oracle shape changed — update _dd16_oracle's marker strip"
    )
    unthresholded = inner.rstrip()[: -len(marker)]
    return f"""
    WITH scored AS ({unthresholded})
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_verified_05,
           CAST(sum(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_verified_08,
           CASE WHEN count(*) > 0 THEN
               CAST((sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) * 20000
                     + count(*)) // (2 * count(*)) AS BIGINT)
           ELSE CAST(0 AS BIGINT) END AS precision_e4
    FROM scored
    """


@q("dd16_lsh_precision_report", _dd16_oracle())
def dd16_lsh_precision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-precision report for the MinHash-LSH dedup index — the
    third leg of the index-quality trilogy (s19 recall, s23 distortion,
    this one candidate precision): of all banded candidate pairs, how
    many verify at Jaccard >= 0.5 and >= 0.8, and the half-up e4
    precision — the number that says whether the band/permutation
    configuration wastes verify cycles (precision too low) or risks
    recall (suspiciously perfect).  Same corpus and arithmetic as dd3
    (the oracle literally aggregates dd3's unthresholded pair table, so
    the two can never drift); candidates via the skinny signature
    pipeline, verify via shingle-set join — one 1-row output."""
    from martech_pipelines_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = base.unionByName(near)
    cand = DD.lsh_candidate_pairs(corpus, num_perm=16, bands=4, shingle_n=3)
    scored = DD.jaccard_on_pairs(cand, corpus, shingle_n=3)
    ver05 = F.sum((F.col("jaccard") >= 0.5).cast("long"))
    return scored.agg(
        F.count("*").alias("n_candidates"),
        ver05.alias("n_verified_05"),
        F.sum((F.col("jaccard") >= 0.8).cast("long")).alias("n_verified_08"),
        F.when(
            F.count("*") > 0,
            F.expr(
                "(sum(CAST(jaccard >= 0.5 AS LONG)) * 20000L + count(*))"
                " div (2L * count(*))"
            ),
        ).otherwise(F.lit(0).cast("long")).alias("precision_e4"),
    )


# ---------------------------------------------------------------------------
# t48: PII/pattern profile — the scrub-before-training hygiene report
# ---------------------------------------------------------------------------

_T48_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_T48_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_T48_URL = r"https?://[^\s]+"


def _t48_oracle() -> str:
    return f"""
    WITH corpus AS (
        -- the synthetic corpus carries no natural PII; inject
        -- deterministic id-derived patterns (the dd3/dd5 perturbed-copy
        -- convention) so the profile is non-trivial and exact
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % 4 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com via https://site'
                            || CAST(doc_id % 7 AS VARCHAR) || '.org/page'
                       ELSE '' END
               || CASE WHEN doc_id % 6 = 0
                       THEN ' call +1-555-000-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS text
        FROM documents
    ), per_doc AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '{_T48_EMAIL}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(text, '{_T48_PHONE}')) AS BIGINT)
                   AS n_phone,
               CAST(len(regexp_extract_all(text, '{_T48_URL}')) AS BIGINT)
                   AS n_url
        FROM corpus
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_email + n_phone + n_url > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
           CAST(sum(n_email) AS BIGINT) AS total_emails,
           CAST(sum(n_phone) AS BIGINT) AS total_phones,
           CAST(sum(n_url) AS BIGINT) AS total_urls,
           CAST((sum(CASE WHEN n_email + n_phone + n_url > 0
                          THEN 1 ELSE 0 END) * 20000 + count(*))
                // (2 * count(*)) AS BIGINT) AS flagged_share_e4
    FROM per_doc GROUP BY source
    """


@q("t48_pii_pattern_profile", _t48_oracle())
def t48_pii_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII/pattern hygiene profile — the scrub-before-
    training report (emails, phone numbers, URLs): doc counts, per-
    pattern totals, and the half-up e4 share of flagged docs, the
    numbers that decide whether a source needs redaction before it
    enters a training mix.  Pattern extraction is one codegen'd
    projection (JVM regex, no Python); one map-side-combined agg —
    scales with |sources|.  Both engines evaluate the identical regex
    strings (dialect agreement pinned by the oracle itself).  The
    synthetic corpus carries no natural PII, so id-derived patterns are
    injected deterministically — the dd3/dd5 perturbed-copy
    convention."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com via https://site"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".org/page"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.concat(
                    F.lit(" call +1-555-000-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    per = injected.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_T48_EMAIL), F.lit(0))).cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all("text", F.lit(_T48_PHONE), F.lit(0))).cast("long")
        .alias("n_phone"),
        F.size(F.regexp_extract_all("text", F.lit(_T48_URL), F.lit(0))).cast("long")
        .alias("n_url"),
    )
    flagged = (F.col("n_email") + F.col("n_phone") + F.col("n_url") > 0).cast(
        "long"
    )
    return per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(flagged).alias("docs_flagged"),
        F.sum("n_email").alias("total_emails"),
        F.sum("n_phone").alias("total_phones"),
        F.sum("n_url").alias("total_urls"),
        F.expr(
            "(sum(CAST(n_email + n_phone + n_url > 0 AS LONG)) * 20000L"
            " + count(*)) div (2L * count(*))"
        ).alias("flagged_share_e4"),
    )


# ---------------------------------------------------------------------------
# s24: reciprocal-rank fusion of the exact and quantized rankers
# ---------------------------------------------------------------------------


def _s24_oracle() -> str:
    from martech_pipelines_spark.plans.corpus import ORACLE as _OR

    a = _OR["s1_bruteforce_topk"]
    b = _OR["s8c_pq_adc_deterministic_topk"]
    contrib = "CAST((2000000000 + (60 + rnk)) // (2 * (60 + rnk)) AS BIGINT)"
    return f"""
    WITH a AS ({a}), b AS ({b}),
    contrib AS (
        SELECT query_id, vec_id, {contrib} AS c FROM a
        UNION ALL
        SELECT query_id, vec_id, {contrib} AS c FROM b
    ), fused AS (
        SELECT query_id, vec_id,
               CAST(sum(c) AS BIGINT) AS rrf_e9,
               CAST(count(*) AS BIGINT) AS in_lists
        FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, vec_id, rrf_e9, in_lists, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_e9 DESC, vec_id
        ) AS rnk FROM fused
    ) WHERE rnk <= 5
    """


@q("s24_rrf_fusion", _s24_oracle())
def s24_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    systems — the standard hybrid-search combiner, here fusing the
    exact-cosine ranker (s1) with the quantized PQ/ADC ranker (s8c):
    per (query, doc), rrf = sum over lists of 1/(60 + rank), emitted as
    the sum of HALF-UP e9 integer reciprocals so the fusion score,
    ordering, and tie-breaks are engine-exact (the documented integer
    RRF contract — rank is what matters, the e9 quantization never
    reorders because distinct reciprocal sums differ at e9 scale).
    Docs in both top-5 lists dominate (in_lists=2) — exactly RRF's
    consensus-promotion behavior.  Scale: both rankers' outputs are
    |Q|·k rows; the fusion is one tiny keyed agg + window — the fused
    list costs nothing next to either ranker."""
    aq = QUERIES["s1_bruteforce_topk"](spark, sf_dir).select(
        "query_id", "vec_id", "rnk"
    )
    bq = QUERIES["s8c_pq_adc_deterministic_topk"](spark, sf_dir).select(
        "query_id", "vec_id", "rnk"
    )
    contrib = F.expr("(2000000000L + (60L + rnk)) div (2L * (60L + rnk))")
    both = aq.select("query_id", "vec_id", contrib.alias("c")).unionByName(
        bq.select("query_id", "vec_id", contrib.alias("c"))
    )
    fused = both.groupBy("query_id", "vec_id").agg(
        F.sum("c").alias("rrf_e9"), F.count("*").alias("in_lists")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_e9"), F.col("vec_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
    )
