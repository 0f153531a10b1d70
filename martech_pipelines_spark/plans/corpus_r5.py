"""Round-5 corpus additions.

New queries register into the shared QUERIES/ORACLE dicts at import time,
exactly like corpus_r4.  Names added here should also be prepended to
plans/__init__._WINDOW_PRIORITY so the driver's 50-slot correctness window
verifies them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import cdc
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table


# =============================================================================
# pipe5: the reference's EP2 path as ONE pipeline — CDC compaction ->
# profile export transform -> REST batch sink. The relational half (through
# the export transform) is this full-oracle corpus entry; the sink half is
# pinned end-to-end against a live local HTTP stub in
# tests/test_sinks.py::test_pipe5_export_end_to_end, which asserts the
# POSTed record count equals this query's row count.
# Reference: martech_pipelines/tasks/user_profile/clevertap.py:30-61 +
# operators/clevertap_user_profile.py:93-111 (compact -> transform -> ship).
# =============================================================================


@q(
    "pipe5_export_e2e",
    """
    WITH filtered AS (
        SELECT * FROM events WHERE event_type IN ('purchase', 'signup')
    ), ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rnk
        FROM filtered
    ), compact AS (
        SELECT user_id, event_type, value FROM ranked WHERE rnk = 1
    )
    SELECT CAST(user_id AS VARCHAR) AS identity,
           CASE WHEN length(right(CAST(9000000000 + user_id AS BIGINT)::VARCHAR, 10)) = 10
                THEN right(CAST(9000000000 + user_id AS BIGINT)::VARCHAR, 10)
           END AS phone,
           CAST(trunc(value * 100) AS BIGINT) AS value,
           event_type
    FROM compact
    WHERE user_id IS NOT NULL AND user_id <> 0
    """,
)
def pipe5_export_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship E2 compaction feeding the B4 export surface: one keyed
    shuffle (the compaction window), then a narrow codegen-only export
    stage — identity coalesce/rejection, mobile_sanity, modify_reward,
    attribute subset, rename. The sink itself (rest_batch_sink) consumes
    THIS frame partition-parallel; no extra shuffle between compact and
    ship."""
    from martech_pipelines_spark.operators.transforms import (
        ProfileExportConfig,
        profile_export_pipeline,
    )

    ev = load_table(spark, sf_dir, "events")
    compact = cdc.cdc_compact(
        ev,
        key_cols="user_id",
        ts_col="ts",
        since=None,
        change_type_col="event_type",
        pass_types=("purchase", "signup"),
        tiebreak_cols=["event_id"],
    )
    df = compact.withColumn(
        "mobile", (F.lit(9000000000) + F.col("user_id")).cast("string")
    )
    cfg = ProfileExportConfig(
        identity_fields=["user_id"],
        data_type_map={"mobile": "mobile_sanity", "value": "modify_reward"},
        attributes=["mobile", "value", "event_type"],
        swap_key_map={"mobile": "phone"},
    )
    return profile_export_pipeline(df, cfg)


# =============================================================================
# Round-5 operator additions: per-domain caps, curriculum binning,
# canonical-doc selection, time-series gap fill, MERGE upsert.
# =============================================================================

from martech_pipelines_spark.operators import dedup as DD  # noqa: E402
from martech_pipelines_spark.operators import text as TX  # noqa: E402
from martech_pipelines_spark.operators import transforms as TR  # noqa: E402
from martech_pipelines_spark.plans.corpus_extended import (  # noqa: E402
    _CLUSTER_CORPUS_SQL,
    _DUCK_TOKENS,
    _minhash_oracle,
)


def _duck_quality(corpus_sql: str) -> str:
    """DuckDB twin of operators.text.quality_score over an arbitrary
    (doc_id, text) corpus CTE — the same rounded-feature arithmetic as
    t4's oracle."""
    toks = _DUCK_TOKENS.format(col="text")
    stop_list = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    return f"""
        SELECT doc_id,
               round((least(len(toks) / 20.0, 1.0)
                      + (1.0 - least(CASE WHEN n_char > 0
                             THEN round((n_char - n_nopunct)::DOUBLE / n_char, 4)
                             ELSE 0.0 END * 5, 1.0))
                      + least(CASE WHEN len(toks) > 0
                             THEN round(len(list_filter(toks, x -> x IN ({stop_list})))::DOUBLE
                                        / len(toks), 4)
                             ELSE 0.0 END * 4, 1.0)) / 3, 4) AS quality
        FROM (
            SELECT doc_id, {toks} AS toks, length(text) AS n_char,
                   length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_nopunct
            FROM ({corpus_sql})
        )
    """


@q(
    "t23_domain_cap",
    f"""
    WITH qual AS ({_duck_quality("SELECT doc_id, text FROM documents")}),
    ranked AS (
        SELECT d.doc_id, d.source, q.quality,
               row_number() OVER (
                   PARTITION BY d.source ORDER BY q.quality DESC, d.doc_id
               ) AS rk
        FROM documents d JOIN qual q USING (doc_id)
    )
    SELECT doc_id, source, quality, rk FROM ranked WHERE rk <= 10
    """,
)
def t23_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (C4/RefinedWeb-style): keep the 10
    best-quality docs per source. Quality is a codegen scan expression;
    the cap is one keyed top-n window rewritten to WindowGroupLimit, so
    a skewed domain forwards <= 10 rows per map task into the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.domain_cap(docs, domain_col="source", n=10)


@q(
    "t24_curriculum_bins",
    """
    SELECT doc_id, avg_nll, bin FROM (
        SELECT doc_id, avg_nll,
               ntile(4) OVER (ORDER BY avg_nll, doc_id) AS bin
        FROM ({t17}) s
        WHERE avg_nll IS NOT NULL
    )
    """,
)
def t24_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum difficulty binning: quartiles of the t17 LM negative
    log-likelihood. This oracle-pinned form uses exact ntile (global
    window — the small-data form); the 100-TB twin
    (curriculum_bins(exact=False)) assigns bins from broadcast
    approxQuantile boundaries with no global sort — agreement pinned in
    tests/test_r5_ops.py."""
    docs = load_table(spark, sf_dir, "documents")
    scores = TX.ngram_lm_scores(docs, add_k=0.5)
    return TX.curriculum_bins(scores, score_col="avg_nll", n_bins=4).select(
        "doc_id", "avg_nll", "bin"
    )


# splice the registered t17 oracle into t24's template (kept as a
# placeholder above so the two stay in sync if t17's oracle changes)
ORACLE["t24_curriculum_bins"] = ORACLE["t24_curriculum_bins"].replace(
    "({t17})", "(" + ORACLE["t17_ngram_lm_score"] + ")"
)
assert "{t17}" not in ORACLE["t24_curriculum_bins"], (
    "t24 oracle template drifted: placeholder not spliced"
)


_DD12_CORPUS = """
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id, text || ' zz yy xx' AS text
        FROM documents WHERE doc_id % 5 = 0
"""


@q(
    "dd12_keep_best_per_cluster",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(_CLUSTER_CORPUS_SQL)}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach AS (
        SELECT id, id AS label FROM verts
        UNION
        SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    clus AS (SELECT id, CAST(min(label) AS BIGINT) AS cluster FROM reach GROUP BY id),
    qual AS ({_duck_quality(_DD12_CORPUS)}),
    labeled AS (
        SELECT q.doc_id, coalesce(c.cluster, q.doc_id) AS cluster, q.quality
        FROM qual q LEFT JOIN clus c ON c.id = q.doc_id
    )
    SELECT cluster, doc_id AS keep_id, quality FROM (
        SELECT *, row_number() OVER (
            PARTITION BY cluster ORDER BY quality DESC, doc_id
        ) AS rk FROM labeled
    ) WHERE rk = 1
    """,
)
def dd12_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection after near-dup clustering: dd7's planted
    transitive-dup corpus -> minhash pairs -> connected components ->
    keep the best-quality member per cluster (never-paired docs are
    singletons, so the output is the full corpus keep-list). Oracle =
    recursive-CTE reachability + the same quality arithmetic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    exact = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    from martech_pipelines_spark import caching
    from martech_pipelines_spark.operators.parallelism import spread

    # The constructed corpus feeds TWO heavy consumers (the minhash
    # signature chain and the per-doc quality pass) — persist it once,
    # spread so both kernels run on every core instead of the 3-6
    # union-of-scan partitions (profiled r12: 4 sibling 64-task stages
    # re-deriving the union + quality from raw parquet, 5-12s each).
    corpus = caching.register(
        spread(base.unionByName(exact).unionByName(near), by="doc_id").persist()
    )
    pairs = DD.minhash_near_duplicates(
        corpus, threshold=0.5, num_perm=16, bands=4, shingle_n=3
    )
    clusters = DD.dup_clusters(pairs)
    docs_q = corpus.select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    return DD.keep_best_per_cluster(docs_q, clusters)


@q(
    "r20_gap_fill",
    """
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS period, round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT user_id, min(period) AS t0, max(period) AS t1 FROM daily GROUP BY 1
    ), grid AS (
        SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS period
        FROM spans
    ), j AS (
        SELECT g.user_id, g.period, d.v
        FROM grid g LEFT JOIN daily d
          ON d.user_id = g.user_id AND d.period = g.period
    )
    SELECT user_id, strftime(period, '%Y-%m-%d') AS day_str,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY period
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill
    FROM j
    """,
)
def r20_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: daily per-user value sums on
    a dense day grid spanning each user's activity, gaps filled from the
    last observed day. One keyed agg shuffle + one per-key ordered
    window; grid inflation bounded by span/day, not event count."""
    ev = load_table(spark, sf_dir, "events")
    out = TR.resample_ffill(ev, "user_id", "ts", "value", unit="day")
    return out.select(
        "user_id",
        F.date_format("period", "yyyy-MM-dd").alias("day_str"),
        "value_ffill",
    )


@q(
    "h9_merge_upsert",
    """
    WITH base AS (
        SELECT user_id, event_id, event_type, round(value, 2) AS value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rnk
            FROM events WHERE epoch_us(ts) < 1705276800000000
        ) WHERE rnk = 1
    ), chg AS (
        SELECT user_id, event_id, event_type, round(value, 2) AS value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rnk
            FROM events WHERE epoch_us(ts) >= 1705276800000000
        ) WHERE rnk = 1
    )
    SELECT coalesce(c.user_id, b.user_id) AS user_id,
           CASE WHEN c.user_id IS NOT NULL THEN c.event_id ELSE b.event_id END AS event_id,
           CASE WHEN c.user_id IS NOT NULL THEN c.event_type ELSE b.event_type END AS event_type,
           CASE WHEN c.user_id IS NOT NULL THEN c.value ELSE b.value END AS value
    FROM base b FULL JOIN chg c ON b.user_id = c.user_id
    WHERE NOT (c.user_id IS NOT NULL AND c.event_type = 'error')
    """,
)
def h9_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 MERGE-apply: compact the pre-watermark log into a base
    snapshot, the post-watermark log into a change batch, then apply the
    batch with MERGE semantics (change wins; latest change of type
    'error' deletes the key). One keyed full-outer join; both inputs are
    one-row-per-key by construction."""
    ev = load_table(spark, sf_dir, "events")
    # Integer-micros watermark (2024-01-15T00:00:00Z): neither engine
    # parses a timestamp literal, so the split instant — which this
    # query's output genuinely depends on (change-wins + delete_when
    # apply only to the chg batch) — is session-timezone-proof.
    cut_us = 1705276800000000
    base = cdc.latest_per_key(
        ev.where(F.unix_micros("ts") < F.lit(cut_us)),
        "user_id",
        "ts",
        tiebreak_cols=["event_id"],
    ).select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    chg = cdc.latest_per_key(
        ev.where(F.unix_micros("ts") >= F.lit(cut_us)),
        "user_id",
        "ts",
        tiebreak_cols=["event_id"],
    ).select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    return cdc.merge_upsert(
        base,
        chg,
        "user_id",
        delete_when="event_type = 'error'",
        null_safe_keys=False,  # compacted keys are non-null; reuse the
        # compaction shuffles (4 exchanges -> 2, see merge_upsert docstring)
    )


# =============================================================================
# mart7: weekly cohort LTV matrix; dq2: rolling-z-score anomaly monitor;
# t26: BPE encode (the apply side of t14b's induction).
# =============================================================================


@q(
    "mart7_cohort_ltv",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY 1
    ), rev AS (
        SELECT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS INTEGER) AS age_weeks,
               e.value
        FROM events e JOIN firsts f USING (user_id)
        WHERE e.event_type = 'purchase'
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           age_weeks,
           count(DISTINCT user_id) AS n_buyers,
           round(sum(value), 2) AS revenue
    FROM rev GROUP BY 1, 2
    """,
)
def mart7_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users grouped by first-seen week,
    purchase revenue accumulated per cohort x age-in-weeks cell — the
    canonical martech retention-revenue mart. Two keyed shuffles (first-
    seen agg, cohort-cell agg) + one broadcastable user->cohort join;
    both engines truncate weeks to Monday, so the cells align exactly."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("age_weeks"),
            "value",
        )
    )
    return rev.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "age_weeks",
    ).agg(
        F.countDistinct("user_id").alias("n_buyers"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )


@q(
    "dq2_rolling_zscore",
    """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS period, round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    ), cents AS (
        SELECT event_type, period, v,
               CAST(floor(v * 100 + 0.5) AS BIGINT) AS p
        FROM daily
    ), w AS (
        -- exact integer-moment window (HUGEINT here is oracle-internal;
        -- the Spark twin accumulates the same moments in DECIMAL) —
        -- engine-identical, summation-order-free (s12 recipe)
        SELECT event_type, period, v, p,
               sum(CAST(p AS HUGEINT)) OVER win AS s1,
               sum(CAST(p AS HUGEINT) * CAST(p AS HUGEINT)) OVER win AS s2,
               count(p) OVER win AS n
        FROM cents
        WINDOW win AS (
            PARTITION BY event_type ORDER BY period
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    ), m AS (
        SELECT event_type, period, v, n,
               n * s2 - s1 * s1 AS diff,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_p,
               CAST(p AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                   AS dev_p,
               CAST(n * s2 - s1 * s1 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_p
        FROM w
    )
    SELECT event_type, strftime(period, '%Y-%m-%d') AS day_str, v,
           round(mean_p / 100.0, 4) AS mu,
           CASE WHEN n = 7 AND diff > 0
                THEN round(dev_p / sqrt(var_p), 4) END AS z,
           CASE WHEN n = 7 AND diff > 0 THEN abs(dev_p) > 2.0 * sqrt(var_p)
                ELSE FALSE END AS anomaly
    FROM m
    """,
)
def dq2_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-health anomaly monitor: per event type, daily value sums
    scored against the trailing 7-day mean/stddev; |z| > 2 with a full
    window flags the day. One keyed agg + one per-key ordered window.
    Deterministic via exact integer-cent windowed moments (the s12
    recipe — see transforms.rolling_zscore), hardened after r7 because
    this was one of only two never-driver-checked stddev oracles."""
    ev = load_table(spark, sf_dir, "events")
    out = TR.rolling_zscore(
        ev, "event_type", "ts", "value", window_periods=7, z_thresh=2.0
    )
    return out.select(
        "event_type",
        F.date_format("period", "yyyy-MM-dd").alias("day_str"),
        "v",
        "mu",
        "z",
        "anomaly",
    )


@q("t26_bpe_encode")  # rows-only: the merge table is trained (iterative t14b)
def t26_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY side: encode every doc with the merge table t14b
    induces from the same corpus. Merge table = one vocab-sized collect,
    broadcast; encoding is a zero-shuffle Arrow kernel. Correctness is
    pytest-pinned (Sennrich worked example, reconstruction + no-residual-
    merge invariants, partitioning invariance) since the trained table
    makes a SQL oracle inexpressible — same contract as t14b."""
    docs = load_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn_merges(docs, n_merges=8)
    enc = TX.bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        "n_bpe_tokens",
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias("head_pieces"),
    )


# =============================================================================
# t27: exact heavy hitters (two-pass Misra-Gries); s9: contrastive-pair
# mining (hard negatives) over the labeled embedding table.
# =============================================================================

from martech_pipelines_spark.operators import similarity as SIM  # noqa: E402


@q(
    "t27_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest({_DUCK_TOKENS.format(col='text')}) AS w FROM documents
    ), tot AS (SELECT count(*) AS n FROM toks)
    SELECT w, count(*) AS cnt
    FROM toks CROSS JOIN tot
    GROUP BY w, tot.n
    HAVING count(*) >= greatest(1, CAST(ceil(0.01 * n) AS BIGINT))
    """,
)
def t27_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (count >= 1% of the token stream) without a
    vocabulary shuffle: per-partition Misra-Gries summaries form a
    guaranteed candidate superset, then exact counts of candidates only.
    Output is exact + partitioning-invariant despite the sketch — hence
    a full oracle, unlike one-pass sketches (h7)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.heavy_hitters(docs, frac=0.01)


@q(
    "s9_hard_negatives",
    """
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id % 50 = 0
    ), scored AS (
        SELECT q.query_id, e.vec_id, e.label = q.qlabel AS same,
               round(
                   list_dot_product(qv, CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))),
                   4) AS cos_sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id <> q.query_id
    ), best AS (
        SELECT query_id, vec_id, same, cos_sim,
               row_number() OVER (
                   PARTITION BY query_id, same
                   ORDER BY cos_sim DESC, vec_id ASC
               ) AS rn
        FROM scored WHERE cos_sim IS NOT NULL
    )
    SELECT p.query_id,
           p.vec_id AS pos_id, p.cos_sim AS pos_sim,
           n.vec_id AS neg_id, n.cos_sim AS neg_sim
    FROM (SELECT * FROM best WHERE same AND rn = 1) p
    JOIN (SELECT * FROM best WHERE NOT same AND rn = 1) n USING (query_id)
    """,
)
def s9_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining: per anchor (every 50th vector), nearest
    same-label neighbor (positive) and nearest different-label neighbor
    (hard negative) by rounded cosine — broadcast NLJ with precomputed
    row norms, one window over (query, same-label)."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return SIM.hard_negative_mining(anchors, emb)


# =============================================================================
# s9b: IVF-backed hard-negative mining (s9's scale twin); pipe6: BPE
# tokenize -> pack on real tokenizer lengths (t26 x t10 composition).
# =============================================================================


@q("s9b_hard_negatives_ivf")  # rows-only: trained k-means; gates in pytest
def s9b_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s9 through the IVF candidate generator (nprobe cells instead of
    the whole corpus) — the s1->s2b exact->IVF swap applied to
    contrastive mining. Trained quantizer => rows-only; pytest pins
    row-for-row equality with s9 at nprobe==nlist and a pair-recall gate
    at partial probe."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return SIM.hard_negative_mining_ivf(anchors, emb, nlist=16, nprobe=4)


@q("pipe6_tokenize_pack")  # rows-only: trained BPE merges upstream
def pipe6_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch assembly on REAL tokenizer lengths: induce BPE
    merges (t14b) -> encode every doc (t26) -> offset-pack into
    256-token batches per source on n_bpe_tokens (t10's window, fed by
    the encoder instead of the whitespace proxy). The last mile of a
    pretraining data pipeline as one composed frame; invariants pinned
    in tests/test_r5_ops.py."""
    docs = load_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn_merges(docs, n_merges=8)
    enc = TX.bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens")
    joined = docs.select("doc_id", "source").join(enc, "doc_id")
    return TX.sequence_pack(
        joined, budget=256, count_col="n_bpe_tokens"
    ).select(
        "source",
        "pack_id",
        "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
    )


# =============================================================================
# h10: incremental cohort-mart maintenance (IVM applied to mart7).
# =============================================================================


@q("h10_incremental_cohort", ORACLE["mart7_cohort_ltv"])  # SHARES mart7's oracle
def h10_incremental_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart7 maintained INCREMENTALLY: the event log split at the
    watermark into two batches, each folded into min-mergeable firsts +
    additive user-week revenue cells (cdc.cohort_state_update); the
    matrix derived from state must equal the full recompute — the IVM
    proof, same contract as h6. Late-data cohort shifts re-age a user's
    cells through the derived age_weeks, no raw-log replay."""
    ev = load_table(spark, sf_dir, "events")
    # Integer-micros split (tz-proof; the IVM result is split-invariant,
    # but no literal parse should survive in the corpus — r7 hardening).
    cut_us = 1705276800000000  # 2024-01-15T00:00:00Z
    b1 = ev.where(F.unix_micros("ts") < F.lit(cut_us))
    b2 = ev.where(F.unix_micros("ts") >= F.lit(cut_us))
    # fold LATER data first: the second fold's earlier events must
    # shift cohorts correctly (the hard IVM case)
    firsts, cells = cdc.cohort_state_update(None, None, b2)
    firsts, cells = cdc.cohort_state_update(firsts, cells, b1)
    return cdc.cohort_matrix_from_state(firsts, cells)
