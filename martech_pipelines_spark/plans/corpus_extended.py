"""Extended-surface oracle corpus: text analysis, dedup, similarity,
event-time windows, and the classic relational fill-ins (SURVEY.md §7.3,
§2.J). Registered into the same QUERIES/ORACLE dicts as the core corpus.

Oracle-portability ground rules (same as corpus.py): md5-based hashing,
exact DECIMAL arithmetic for money aggregates (bit-identical across
engines, unlike double summation order), rounded ratios, formatted
timestamps, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import dedup as DD
from martech_pipelines_spark.operators import similarity as SIM
from martech_pipelines_spark.operators import text as TX
from martech_pipelines_spark.operators import windows as WIN
from martech_pipelines_spark.plans.corpus import q
from martech_pipelines_spark.sources import load_table

# Shared DuckDB fragments mirroring operators.text exactly.
_DUCK_TOKENS = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9'']+'), x -> x <> '')"
)
_DUCK_NORM = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


# =============================================================================
# Text analysis
# =============================================================================


@q(
    "t1_word_count",
    f"""
    SELECT token, count(*) AS cnt
    FROM (
        SELECT unnest({_DUCK_TOKENS.format(col='text')}) AS token FROM documents
    )
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT 100
    """,
)
def t1_word_count(spark, sf_dir):
    """Classic explode+groupBy word count, top-100 (map-side combine keeps
    the shuffle at vocabulary size, not corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        TX.word_count_table(docs)
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(100)
    )


@q(
    "t2_token_stats",
    f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc
    FROM documents
    """,
)
def t2_token_stats(spark, sf_dir):
    """Token counting — the whitespace/punct tokenizer (BPE-proxy)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        TX.char_count(F.col("text")).cast("long").alias("n_chars_calc"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in TX.LANG_MARKERS[lang])
    toks = _DUCK_TOKENS.format(col="text")
    return f"len(list_filter({toks}, x -> x IN ({markers})))"


@q(
    "t3_lang_id",
    f"""
    WITH scored AS (
        SELECT doc_id,
               {_lang_score_sql('de')} AS score_de,
               {_lang_score_sql('en')} AS score_en,
               {_lang_score_sql('es')} AS score_es,
               {_lang_score_sql('fr')} AS score_fr
        FROM documents
    )
    SELECT doc_id, score_en, score_es, score_fr, score_de,
           CASE
               WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
               WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
               WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
               WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
               ELSE 'fr'
           END AS lang_pred
    FROM scored
    """,
)
def t3_lang_id(spark, sf_dir):
    """Marker-token language ID: per-language hit counts + argmax with
    alphabetical tie-break. One narrow pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    scores = TX.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        *[scores[f"score_{lg}"].alias(f"score_{lg}") for lg in ("en", "es", "fr", "de")],
        TX.lang_id(F.col("text")).alias("lang_pred"),
    )


@q(
    "t4_quality",
    f"""
    WITH base AS (
        SELECT doc_id, text,
               {_DUCK_TOKENS.format(col='text')} AS toks,
               length(text) AS n_char,
               length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_nopunct
        FROM documents
    ), feat AS (
        SELECT doc_id,
               CAST(n_char AS BIGINT) AS n_chars_calc,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) > 0 THEN round(
                   len(list_filter(toks, x -> x IN ({", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)})))::DOUBLE
                   / len(toks), 4) ELSE 0.0 END AS stopword_ratio,
               CASE WHEN n_char > 0 THEN round((n_char - n_nopunct)::DOUBLE / n_char, 4)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN len(toks) > 0 THEN round(
                   list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 4)
                    ELSE 0.0 END AS mean_token_len
        FROM base
    )
    SELECT doc_id, n_chars_calc, n_tokens, stopword_ratio, punct_ratio, mean_token_len,
           round((least(n_tokens / 20.0, 1.0)
                  + (1.0 - least(punct_ratio * 5, 1.0))
                  + least(stopword_ratio * 4, 1.0)) / 3, 4) AS quality
    FROM feat
    """,
)
def t4_quality(spark, sf_dir):
    """Quality features (length/punct/stopword ratios) + composite score."""
    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars_calc"),
        feats["n_tokens"].alias("n_tokens"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
        TX.quality_score(F.col("text")).alias("quality"),
    )


@q(
    "t5_fingerprint",
    f"""
    SELECT doc_id, md5({_DUCK_NORM.format(col='text')}) AS fp
    FROM documents
    """,
)
def t5_fingerprint(spark, sf_dir):
    """Normalized-text md5 fingerprint — the exact-dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


@q(
    "t8_pii_redact",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
                          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 11 = 0 THEN ' call 9876543210' ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\b[0-9]{10}\b')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[PII]', 'g'),
                              '\b[0-9]{10}\b', '[PII]', 'g')) AS redacted_md5
    FROM aug
    """,
)
def t8_pii_redact(spark, sf_dir):
    """PII audit + redaction (emails, 10-digit phones) — the synthetic
    corpus carries no natural PII, so the query plants deterministic
    addresses/numbers (every 7th/11th doc) and pins both the match counts
    and the md5 of the redacted text. Pure regexp codegen, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" call 9876543210")).otherwise(
            F.lit("")
        ),
    )
    counts = TX.pii_counts(txt)
    return docs.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        F.md5(TX.redact_pii(txt)).alias("redacted_md5"),
    )


@q(
    "t9_repetition",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS.format(col='text')} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i+1 AS INTEGER)] AS gram
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2)
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4) AS rep_ratio
    FROM per GROUP BY doc_id
    """,
)
def t9_repetition(spark, sf_dir):
    """Top-bigram repetition ratio — the repeated-n-gram boilerplate/spam
    filter. Two keyed aggregations, both with map-side combine; docs with
    <2 tokens drop out (no bigrams)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.repetition_table(docs)


# Same oracle as t9 — the shuffle-free form must produce identical rows.
_T9_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS.format(col='text')} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i+1 AS INTEGER)] AS gram
      FROM toks, unnest(range(1, len(t))) AS u(i)
    ),
    per AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2)
    SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
           round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4) AS rep_ratio
    FROM per GROUP BY doc_id
"""


@q("t9b_repetition_hof", _T9_ORACLE)
def t9b_repetition_hof(spark, sf_dir):
    """t9 with ZERO shuffle (the 100-TB form): top-bigram multiplicity =
    longest equal-adjacent run in the sorted bigram array, one codegen
    fold per row. Shares t9's oracle — proof the shuffle elimination is a
    pure physical change."""
    docs = load_table(spark, sf_dir, "documents")
    cols = TX.repetition_cols(F.col("text"))
    return (
        docs.select(
            "doc_id",
            cols["n_bigrams"].alias("n_bigrams"),
            cols["rep_ratio"].alias("rep_ratio"),
        )
        .where(F.col("n_bigrams") > 0)
    )


@q(
    "t10_sequence_pack",
    f"""
    WITH toks AS (
      SELECT source, doc_id,
             len({_DUCK_TOKENS.format(col='text')}) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tok,
             CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tok) / 512.0) AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT source, pack_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM packed GROUP BY 1, 2
    """,
)
def t10_sequence_pack(spark, sf_dir):
    """Offset-based training-batch packing (512-token budget): each doc's
    pack is floor(start_offset/budget) within its source partition — the
    window partitions by source, so no global single-partition sort (the
    scale trap of naive greedy packing). A pack's total may exceed the
    budget when a doc straddles the boundary — that is the pinned
    offset-based semantics."""
    docs = load_table(spark, sf_dir, "documents")
    out = TX.sequence_pack(docs, budget=512)
    return out.select(
        "source", "pack_id", "n_docs", F.col("total_tokens").cast("long").alias("total_tokens")
    )


@q(
    "t11_chunk_spans",
    """
    WITH spans AS (
      SELECT doc_id, s, substring(text, CAST(s + 1 AS INTEGER), 200) AS chunk
      FROM documents,
           unnest(generate_series(0, CAST(length(text) AS BIGINT) - 1, 150)) AS u(s)
      WHERE length(text) > 0
    )
    SELECT doc_id, CAST(s / 150 AS BIGINT) AS chunk_id,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           md5(chunk) AS chunk_md5
    FROM spans
    """,
)
def t11_chunk_spans(spark, sf_dir):
    """RAG-style overlapping chunking: 200-char windows every 150 chars
    (50 overlap), identified by (doc, chunk_id) + content md5 — one
    sequence+explode per row, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.chunk_spans(docs, chunk_chars=200, stride=150)


@q(
    "t12_deterministic_sample",
    """
    SELECT doc_id, source
    FROM documents
    WHERE ('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 25
    """,
)
def t12_deterministic_sample(spark, sf_dir):
    """Stratified deterministic ~25% sample: membership = md5(stratum:id)
    bucket — reproducible across runs, engines, partitionings, and
    cluster sizes, which is what train/eval splits need (df.sample is
    seed- AND partitioning-dependent). Pure codegen filter."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.deterministic_sample(docs, pct=25).select("doc_id", "source")


@q(
    "s5_normalized_embeddings",
    """
    WITH u AS (
        SELECT vec_id,
               CASE WHEN sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) > 0
                    THEN list_transform(CAST(embedding AS DOUBLE[]),
                                        x -> round(x / sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), y -> y * y))), 6))
               END AS unit
        FROM embeddings
    )
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
           CAST(unit[CAST(i AS INTEGER)] AS DOUBLE) AS unit_v
    FROM u, unnest(range(1, len(unit) + 1)) AS t(i)
    UNION ALL
    SELECT vec_id, NULL AS dim, NULL AS unit_v FROM u WHERE unit IS NULL
    """,
)
def s5_normalized_embeddings(spark, sf_dir):
    """Unit-normalization of the embedding column (pre-index step: cosine
    becomes dot product). Norm computed once per row via a staged alias —
    see operators/similarity.py::normalized_embeddings for the no-CSE-in-
    lambda rationale.

    Checked output is the EXPLODED scalar form (vec_id, dim, unit_v) —
    mirrors s4_label_centroids — because the driver's correctness harness
    canonicalizes via pandas, which cannot hash array-typed cells
    (CORRECTNESS_r02: the one red row). The array-returning operator
    itself stays pinned by tests/test_similarity.py. posexplode_outer
    keeps zero-vector rows (null unit) visible as a (vec_id, null, null)
    row; the oracle's UNION ALL branch matches that."""
    emb = load_table(spark, sf_dir, "embeddings")
    unit = SIM.normalized_embeddings(emb)
    return unit.select(
        "vec_id", F.posexplode_outer("unit").alias("dim", "unit_v")
    )


@q(
    "s4_label_centroids",
    """
    SELECT label, CAST(i - 1 AS INTEGER) AS dim,
           round(avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) AS mean_v,
           count(*) AS n_vecs
    FROM embeddings, unnest(range(1, len(embedding)+1)) AS u(i)
    GROUP BY 1, 2
    """,
)
def s4_label_centroids(spark, sf_dir):
    """Per-label centroid components (class prototypes / drift monitoring):
    posexplode + one keyed aggregation with map-side combine — exploded
    (label, dim) rows instead of array re-assembly, so no UDF and a clean
    unnest-based oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.label_centroids(emb)


# =============================================================================
# Deduplication
# =============================================================================

# Synthetic dup corpus: every 10th doc gets an exact copy (id+1_000_000)
# and every 5th a perturbed near-copy (id+2_000_000, 3 extra words).
_DUP_CORPUS_DUCK = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0
"""


def _dup_corpus_spark(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    near = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat("text", F.lit(" zz yy xx")).alias("text"),
        )
    )
    return docs.unionByName(exact).unionByName(near)


@q(
    "dd1_exact_dedup",
    f"""
    WITH corpus AS ({_DUP_CORPUS_DUCK}),
    keyed AS (
        SELECT doc_id, md5({_DUCK_NORM.format(col='text')}) AS fp FROM corpus
    )
    SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM keyed
    ) WHERE rn = 1
    """,
)
def dd1_exact_dedup(spark, sf_dir):
    """Exact dedup: lowest-id representative per content fingerprint."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    return DD.exact_dedup(corpus).select("doc_id")


@q(
    "dd2_dup_groups",
    f"""
    WITH corpus AS ({_DUP_CORPUS_DUCK})
    SELECT md5({_DUCK_NORM.format(col='text')}) AS fp,
           count(*) AS group_size,
           min(doc_id) AS representative
    FROM corpus
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def dd2_dup_groups(spark, sf_dir):
    """Duplicate-group accounting (the dedup audit table)."""
    corpus = _dup_corpus_spark(spark, sf_dir)
    return DD.duplicate_groups(corpus).where(F.col("group_size") > 1)


_MINHASH_CORPUS_SQL = """
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0
"""


def _minhash_oracle(corpus_sql: str = _MINHASH_CORPUS_SQL) -> str:
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
    return f"""
    WITH corpus AS (
{corpus_sql}
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
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
               CASE WHEN (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) > 0
                    THEN round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                         / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
                    ELSE 0.0 END AS jaccard
        FROM cand
        JOIN shs sa ON sa.doc_id = id_a
        JOIN shs sb ON sb.doc_id = id_b
    ) WHERE jaccard >= 0.5
    """


@q("dd3_minhash_near_dup", _minhash_oracle())
def dd3_minhash_near_dup(spark, sf_dir):
    """MinHash(16)+LSH(4 bands) near-dup pairs, exact-Jaccard verified at
    0.5 — the full scale pipeline on a 1/5 doc sample + perturbed copies.
    The oracle replicates signature, banding, and verification bit-for-bit
    (md5 arithmetic is engine-portable)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = base.unionByName(near)
    return DD.minhash_near_duplicates(
        corpus, threshold=0.5, num_perm=16, bands=4, shingle_n=3
    )


@q("dd3b_minhash_rejoin", _minhash_oracle())
def dd3b_minhash_rejoin(spark, sf_dir):
    """dd3 through the ``verify='rejoin'`` path: skinny signature shuffle
    (P longs per doc, real map-side combine) + semi-join-pruned shingle
    re-derivation for candidate docs only — the sparse-corpus 100-TB form.
    Shares dd3's bit-exact oracle, proving the two verify strategies are
    interchangeable (flip criterion: candidate share ~10%, see
    operators/dedup.py::minhash_near_duplicates)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = base.unionByName(near)
    return DD.minhash_near_duplicates(
        corpus, threshold=0.5, num_perm=16, bands=4, shingle_n=3, verify="rejoin"
    )


@q("dd3c_minhash_materialized", _minhash_oracle())
def dd3c_minhash_materialized(spark, sf_dir):
    """dd3 through the MATERIALIZED two-stage form: stage 1 writes the
    signature+shingle-set table once (one raw-corpus scan); stage 2 runs
    candidates + exact-Jaccard verify reading ONLY that table — the
    re-run path for threshold/band sweeps over a 100-TB corpus. Shares
    dd3's bit-exact oracle (third interchangeable formulation, after the
    carried and rejoin verify strategies); the stage-2 no-raw-scan claim
    is pinned by a plan assertion in tests/test_plans.py."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = base.unionByName(near)
    index_path = tempfile.mkdtemp(prefix="minhash_index_")
    DD.minhash_build_index(corpus, index_path, num_perm=16, shingle_n=3)
    return DD.minhash_index_near_duplicates(
        spark, index_path, threshold=0.5, num_perm=16, bands=4
    )


_CLUSTER_CORPUS_SQL = """
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 2000000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0
"""


def _dup_cluster_oracle() -> str:
    return f"""
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
    )
    SELECT id, CAST(min(label) AS BIGINT) AS cluster FROM reach GROUP BY id
    """


@q("dd7_dup_clusters", _dup_cluster_oracle())
def dd7_dup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS (connected components over near-dup pairs):
    the corpus plants transitive chains — every 10th doc has both an
    exact copy (+1M) and a perturbed near-copy (+2M), so {base, +1M, +2M}
    must merge into one cluster even though (+1M, +2M) may never pair
    directly. Spark side = iterative min-label propagation; oracle =
    DuckDB recursive CTE reachability — an iterative distributed
    algorithm checked exactly against a recursive-SQL ground truth."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 5 == 0)
    exact = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = base.unionByName(exact).unionByName(near)
    pairs = DD.minhash_near_duplicates(
        corpus, threshold=0.5, num_perm=16, bands=4, shingle_n=3
    )
    return DD.dup_clusters(pairs).select("id", F.col("cluster").cast("long"))


def _simhash_oracle() -> str:
    toks = _DUCK_TOKENS.format(col=_DUCK_NORM.format(col="text"))
    bit_terms = "\n             + ".join(
        "CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {v} ELSE 0 END".format(
            j=j, v=1 << j
        )
        for j in range(32)
    )
    return f"""
    WITH hashed AS (
        SELECT doc_id,
               list_transform(list_distinct({toks}),
                              t -> ('0x' || substr(md5('sim:' || t), 1, 8))::BIGINT) AS hs
        FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           CAST({bit_terms} AS BIGINT) AS simhash
    FROM hashed WHERE len(hs) > 0
    """


@q("dd4_simhash", _simhash_oracle())
def dd4_simhash(spark, sf_dir):
    """32-bit SimHash fingerprints (bit-majority of token hashes),
    explode+aggregate form (one tokenization, map-side-combined votes)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return DD.simhash_fingerprints(docs).select(
        F.col("id").alias("doc_id"), F.col("h").alias("simhash")
    )


@q(
    "dd5_ngram_jaccard",
    f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000, text || ' zz yy xx' FROM documents WHERE doc_id % 5 = 0
    ), toksrc AS (
        SELECT doc_id, {_DUCK_TOKENS.format(col=_DUCK_NORM.format(col="text"))} AS t
        FROM corpus
    ), shs AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 3
                   THEN list_transform(generate_series(1, len(t) - 2),
                                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sh
        FROM toksrc
    )
    SELECT p.id_a, p.id_b,
           CASE WHEN (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) > 0
                THEN round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                     / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
                ELSE 0.0 END AS jaccard
    FROM (
        SELECT doc_id AS id_a, doc_id + 2000000 AS id_b
        FROM documents WHERE doc_id % 5 = 0
    ) p
    JOIN shs sa ON sa.doc_id = p.id_a
    JOIN shs sb ON sb.doc_id = p.id_b
    """,
)
def dd5_ngram_jaccard(spark, sf_dir):
    """Word-3-gram Jaccard on an explicit aligned pair table (original vs
    perturbed copy) — the verification kernel isolated from blocking."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx")).alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = docs.where(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 2000000).alias("id_b")
    )
    return DD.ngram_jaccard_pairs(pairs, corpus, n=3)


@q(
    "dd6_cross_source",
    f"""
    WITH keyed AS (
      SELECT doc_id, source, md5({_DUCK_NORM.format(col='text')}) AS fp
      FROM (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, 'mirror', text FROM documents WHERE doc_id % 10 = 0
      )
    ),
    fps AS (SELECT fp, count(DISTINCT source) AS n_sources FROM keyed GROUP BY fp)
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_source
    FROM keyed JOIN fps USING (fp)
    GROUP BY source
    """,
)
def dd6_cross_source(spark, sf_dir):
    """Cross-source contamination audit: per source, how many docs share an
    exact fingerprint with ANOTHER source — the leakage check before mixing
    corpora into a training set. A planted 'mirror' source (exact copies of
    every 10th doc) guarantees non-zero signal at gate scale. Two keyed
    aggregations on the 32-byte fingerprint; never a doc-to-doc self-join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    mirror = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("mirror").alias("source"),
        "text",
    )
    return DD.cross_source_dup_stats(docs.unionByName(mirror))


# =============================================================================
# Similarity search
# =============================================================================


_S1_ORACLE = """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id % 10 = 0
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               round(
                   list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))),
                   4) AS cos_sim
        FROM q CROSS JOIN embeddings e
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
        ) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    ) WHERE rnk <= 5
    """


@q("s1_bruteforce_topk", _S1_ORACLE)
def s1_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-5 per query (every 10th vector as query set):
    broadcast queries x corpus, double-precision dot products, rank on the
    ROUNDED similarity (so cross-engine fp noise cannot flip ranks) with
    vec_id tie-break."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.brute_force_topk(queries, emb, k=5).select(
        "query_id", "vec_id", "cos_sim", "rnk"
    )


@q("s1b_bruteforce_arrow", _S1_ORACLE)  # SHARES s1's oracle: exact twin
def s1b_bruteforce_arrow(spark, sf_dir):
    """s1 through the Arrow map-side-top-k kernel: one matmul per corpus
    batch against the collected query matrix, only within-batch top-k
    rows reach the final window — the exact-search plan whose shuffle
    stays megabytes at 100 TB. Shares s1's full oracle (rank on rounded
    sims makes the numpy-vs-fold summation-order 1-ulp noise invisible);
    pytest additionally pins row-for-row equality with s1."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.brute_force_topk_arrow(queries, emb, k=5).select(
        "query_id", "vec_id", "cos_sim", "rnk"
    )


def _rp_sig_sql(vec_expr: str, dim: int = 64, bits: int = 16) -> str:
    """DuckDB expression computing the SAME b-bit random-hyperplane
    signature as operators.similarity.rp_signature_pandas: bit i = sign of
    list_dot_product(vec, plane_i), plane constants inlined as exact
    double literals (md5-derived, so both engines see identical planes).
    Sign decisions are fp-stable across engines except measure-zero
    exact-zero dots."""
    terms = []
    for i in range(bits):
        lits = ", ".join(repr(c) for c in SIM._hyperplane(dim, i))
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, [{lits}]) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return "(" + "\n         + ".join(terms) + ")"


def _banded_sql(source_cte: str, bands: int = 4, band_bits: int = 4) -> str:
    """CTE fragment: one (band, band_val) row per vector per band —
    DuckDB twin of the single posexplode pass in lsh_topk."""
    mask = (1 << band_bits) - 1
    band_list = ", ".join(str(b) for b in range(bands))
    return f"""
        SELECT vec_id, v, b.band, (sig >> (b.band * {band_bits})) & {mask} AS band_val
        FROM {source_cte} CROSS JOIN (SELECT unnest([{band_list}]) AS band) b
    """


_S2_ORACLE = f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sig AS (
        SELECT vec_id, v, {_rp_sig_sql('v')} AS sig FROM base
    ), banded AS ({_banded_sql('sig')}),
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
        FROM banded qb JOIN banded cb USING (band, band_val)
        WHERE qb.vec_id % 10 = 0
    ), scored AS (
        SELECT cand.query_id, cand.vec_id,
               round(CASE WHEN sqrt(list_dot_product(q.v, q.v))
                               * sqrt(list_dot_product(e.v, e.v)) > 0
                     THEN list_dot_product(q.v, e.v)
                          / (sqrt(list_dot_product(q.v, q.v))
                             * sqrt(list_dot_product(e.v, e.v)))
                     END, 4) AS cos_sim
        FROM cand
        JOIN base q ON q.vec_id = cand.query_id
        JOIN base e ON e.vec_id = cand.vec_id
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
        ) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    ) WHERE rnk <= 5
    """


@q("s2_lsh_topk", _S2_ORACLE)
def s2_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH top-5 (16 bits, 4 bands): the scale path —
    no crossJoin; candidates come from signature-band collisions only.
    Approximate vs. exhaustive search, but DETERMINISTIC given the
    md5-derived hyperplanes, so the full candidate-generation + re-rank
    pipeline has an exact DuckDB oracle (signature bits recomputed from
    the same inlined plane constants via list_dot_product). Recall vs s1
    ground truth additionally pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.lsh_topk(queries, emb, dim=64, k=5).select(
        "query_id", "vec_id", "cos_sim", "rnk"
    )


@q("s2b_ivf_topk")  # rows-only: approximate (KMeans cells); recall in tests
def s2b_ivf_topk(spark, sf_dir):
    """IVF top-5 (16 cells, probe 4): KMeans coarse quantizer + in-cell
    exact re-rank — the inverted-file ANN path. Rows-only driver check;
    pytest gates recall against s1 ground truth."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk(queries, emb, k=5).select(
        "query_id", "vec_id", "cos_sim", "rnk"
    )


@q("s2c_ivf_materialized")  # rows-only: approximate; pruning pinned in tests
def s2c_ivf_materialized(spark, sf_dir):
    """Two-stage IVF (VERDICT r01 #3): stage 1 writes the corpus
    partitioned by KMeans cell (inverted lists as physical partitions) plus
    a tiny centroid table; stage 2 probes with a LITERAL cell IN-list, so
    the corpus scan carries PartitionFilters and reads only the probed
    cells' partitions. The index is rebuilt per call (deterministic seed)
    into a repo-local cache dir — at 100 TB stage 1 is a standing batch
    job and stage 2 is the only per-query cost."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    index_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".ivf_cache",
        sf_name,
    )
    SIM.ivf_build_index(emb, index_path=index_path, nlist=16)
    # every 100th vector as the probe set: a realistically-narrow query
    # batch, so the partition pruning is visible (probing every 10th vector
    # touches all 16 cells and the INSET degenerates to the full list)
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_probe_topk(queries, index_path, k=5, nprobe=4).select(
        "query_id", "vec_id", "cos_sim", "rnk"
    )


_S3_ORACLE = f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 10000000,
               CAST(list_transform(embedding,
                    x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT)) AS DOUBLE[])
        FROM embeddings WHERE vec_id % 20 = 0
    ), sig AS (
        SELECT vec_id, v, {_rp_sig_sql('v')} AS sig FROM corpus
    ), banded AS ({_banded_sql('sig')}),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM banded a JOIN banded b USING (band, band_val)
        WHERE a.vec_id < b.vec_id
    ), scored AS (
        SELECT cand.id_a, cand.id_b,
               round(CASE WHEN sqrt(list_dot_product(va.v, va.v))
                               * sqrt(list_dot_product(vb.v, vb.v)) > 0
                     THEN list_dot_product(va.v, vb.v)
                          / (sqrt(list_dot_product(va.v, va.v))
                             * sqrt(list_dot_product(vb.v, vb.v)))
                     END, 4) AS cos_sim
        FROM cand
        JOIN corpus va ON va.vec_id = cand.id_a
        JOIN corpus vb ON vb.vec_id = cand.id_b
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.9
    """


@q("s3_embedding_near_dup", _S3_ORACLE)
def s3_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (>=0.9) via signature-band blocking
    + exact-cosine verify. Deterministic given the md5-derived
    hyperplanes, so the blocking itself is oracle-checked: the DuckDB twin
    recomputes the same signature bits, band join, and rounded cosine.

    The synthetic corpus has no natural pairs above the threshold at gate
    scale (CORRECTNESS_r01 saw 0 rows = zero driver signal), so the query
    plants scaled copies of every 20th vector: scaling preserves direction,
    so each planted pair has cosine exactly 1.0 AND an identical
    hyperplane signature — recovery through the band-blocking path is
    guaranteed, making the row count a real end-to-end check. Planted-pair
    recovery is additionally pinned in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5))
        .cast("array<float>")
        .alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(planted)
    return SIM.embedding_near_duplicates(corpus, dim=64, threshold=0.9)


def _pipeline_oracle() -> str:
    """End-to-end prep oracle assembled from the per-operator fragments."""
    toks = _DUCK_TOKENS.format(col="text")
    norm = _DUCK_NORM.format(col="text")
    stop = ", ".join(f"'{w}'" for w in TX.STOPWORDS_EN)
    lang_case = f"""CASE
        WHEN greatest({_lang_score_sql('de')}, {_lang_score_sql('en')},
                      {_lang_score_sql('es')}, {_lang_score_sql('fr')}) = 0 THEN 'und'
        WHEN {_lang_score_sql('de')} = greatest({_lang_score_sql('de')}, {_lang_score_sql('en')},
                      {_lang_score_sql('es')}, {_lang_score_sql('fr')}) THEN 'de'
        WHEN {_lang_score_sql('en')} = greatest({_lang_score_sql('de')}, {_lang_score_sql('en')},
                      {_lang_score_sql('es')}, {_lang_score_sql('fr')}) THEN 'en'
        WHEN {_lang_score_sql('es')} = greatest({_lang_score_sql('de')}, {_lang_score_sql('en')},
                      {_lang_score_sql('es')}, {_lang_score_sql('fr')}) THEN 'es'
        ELSE 'fr' END"""
    quality = f"""round((least(len({toks}) / 20.0, 1.0)
        + (1.0 - least(round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                             / length(text), 4) * 5, 1.0))
        + least(round(len(list_filter({toks}, x -> x IN ({stop})))::DOUBLE / len({toks}), 4) * 4, 1.0)) / 3, 4)"""
    return f"""
    WITH kept AS (
        SELECT doc_id, source, text FROM documents
        WHERE length(text) > 0 AND len({toks}) > 0
          AND ({lang_case}) = 'en'
          AND ({quality}) >= 0.4
    ), ranked AS (
        SELECT doc_id, source, text,
               row_number() OVER (PARTITION BY md5({norm}) ORDER BY doc_id) AS rn
        FROM kept
    ), deduped AS (
        SELECT doc_id, source, text FROM ranked WHERE rn = 1
    ), sampled AS (
        SELECT doc_id, source, text FROM deduped
        WHERE ('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50
    )
    SELECT doc_id, source, CAST(len({toks}) AS BIGINT) AS n_tokens
    FROM sampled
    """


@q("pipe1_training_prep", _pipeline_oracle())
def pipe1_training_prep(spark, sf_dir):
    """End-to-end training-data prep as ONE DataFrame chain: quality
    filter -> language filter (en) -> exact dedup (lowest-id survivor) ->
    deterministic 50% stratified sample -> token counting. Every stage is
    an operator from this engine composed unchanged — the user story the
    whole north-star surface exists for. The only shuffle is the dedup's
    fingerprint window; everything else is narrow codegen."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.where(
        (F.length("text") > 0)
        & (TX.token_count(F.col("text")) > 0)
        & (TX.lang_id(F.col("text")) == "en")
        & (TX.quality_score(F.col("text")) >= 0.4)
    )
    deduped = DD.exact_dedup(kept)
    sampled = TX.deterministic_sample(deduped, pct=50)
    return sampled.select(
        "doc_id",
        "source",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )


# =============================================================================
# Martech analytics (funnel, retention) — the domain queries a user of the
# reference would actually run on the event stream
# =============================================================================


@q(
    "mart1_funnel",
    """
    WITH stg AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s1_view,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS s2_click_after_view,
           CAST(sum(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS s3_purchase_after_click
    FROM stg
    """,
)
def mart1_funnel(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): one conditional-min
    aggregation per user, then scalar stage counts. Pinned simplified
    semantics: a user advances a stage iff the FIRST occurrence of each
    stage is strictly later than the first occurrence of the previous one
    (null comparisons fail closed). Single keyed shuffle + tiny final agg."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stg = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    adv2 = F.col("t_click") > F.col("t_view")
    adv3 = adv2 & (F.col("t_purchase") > F.col("t_click"))
    return stg.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("s1_view"),
        F.sum(F.when(adv2, 1).otherwise(0)).alias("s2_click_after_view"),
        F.sum(F.when(adv3, 1).otherwise(0)).alias("s3_purchase_after_click"),
    )


@q(
    "mart2_retention",
    """
    WITH firstw AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', cohort, w) / 7 AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity JOIN firstw USING (user_id)
    GROUP BY cohort, w
    """,
)
def mart2_retention(spark, sf_dir):
    """Weekly retention cohorts: cohort = ISO week of first activity,
    n_active = distinct users of that cohort active k weeks later. Both
    engines truncate weeks to Monday, so offsets are exact day/7 on
    aligned dates. Two keyed aggregations + one join on user_id."""
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    return (
        activity.join(firstw, "user_id")
        .groupBy("cohort", "w")
        .agg(F.count("*").alias("n_active"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("w", "cohort") / 7).cast("long").alias("week_offset"),
            "n_active",
        )
    )


# =============================================================================
# Event-time windows (batch-expressible)
# =============================================================================


@q(
    "w1_tumbling",
    """
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events,
           CAST(round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def w1_tumbling(spark, sf_dir):
    """Tumbling 1-day windows per user (epoch-aligned = UTC date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    return WIN.tumbling_agg(ev, "1 day")


@q(
    "w2_sliding",
    """
    SELECT user_id,
           strftime(to_timestamp((CAST(floor(epoch(ts) / 21600) AS BIGINT) - i) * 21600),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n_events
    FROM events
    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
    GROUP BY 1, 2
    """,
)
def w2_sliding(spark, sf_dir):
    """Sliding 1-day/6-hour windows: each event belongs to exactly 4
    windows (size/slide); the oracle enumerates the 4 aligned starts."""
    ev = load_table(spark, sf_dir, "events")
    return WIN.sliding_agg(ev, "1 day", "6 hours")


@q(
    "w3_session",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS sess_end,
           count(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def w3_session(spark, sf_dir):
    """Session windows (30-min gap) per user; end = last event + gap
    (Spark session_window semantics, spelled out as gaps-and-islands in
    the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return WIN.session_agg(ev, "30 minutes")


# =============================================================================
# Relational fill-ins (§2.J gaps, all Spark built-ins)
# =============================================================================


@q(
    "r1_topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def r1_topk_orders(spark, sf_dir):
    """Sort + limit top-k (Spark executes as TakeOrderedAndProject — no
    full sort materialization)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@q(
    "r2_set_ops",
    """
    WITH y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
         y98 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
    SELECT
        (SELECT count(*) FROM (SELECT * FROM y97 UNION SELECT * FROM y98)) AS n_union,
        (SELECT count(*) FROM (SELECT * FROM y97 INTERSECT SELECT * FROM y98)) AS n_intersect,
        (SELECT count(*) FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y98)) AS n_except
    """,
)
def r2_set_ops(spark, sf_dir):
    """union / intersect / except (distinct semantics)."""
    od = load_table(spark, sf_dir, "orders")
    y97 = od.where(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    y98 = od.where(F.year("o_orderdate") == 1998).select("o_custkey").distinct()
    n_union = y97.union(y98).distinct().count()
    n_intersect = y97.intersect(y98).count()
    n_except = y97.exceptAll(y98.intersect(y97)).distinct().count()
    return spark.createDataFrame(
        [(n_union, n_intersect, n_except)],
        "n_union long, n_intersect long, n_except long",
    )


@q(
    "r3_distinct_agg",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def r3_distinct_agg(spark, sf_dir):
    """Multi-column distinct aggregation (Catalyst expands to a two-stage
    aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@q("r3b_approx_distinct")  # rows-only: HLL sketches differ across engines
def r3b_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): engine-specific sketch, so no
    cross-engine oracle; pytest bounds its error vs the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


@q(
    "r4_rollup",
    """
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS DOUBLE) AS total_bal,
           count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def r4_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals. Money summed as DECIMAL (exact, engine-
    portable) then cast to double — double summation order would drift."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_bal"),
            F.count("*").alias("n_cust"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_bal",
            "n_cust",
        )
    )


@q(
    "r5_anti_join",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_custkey IS NOT NULL AND year(o_orderdate) = 1997
    )
    """,
)
def r5_anti_join(spark, sf_dir):
    """Left-anti join: customers with no 1997 orders (date-bounded so the
    result is non-trivial at every scale factor)."""
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    return cust.join(
        od, cust.c_custkey == od.o_custkey, "left_anti"
    ).select("c_custkey")


@q(
    "r6_asof_join",
    """
    SELECT e.user_id, e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           strftime(
               (SELECT max(c.ts) FROM events c
                WHERE c.user_id = e.user_id AND c.event_type = 'click'
                  AND c.ts <= e.ts),
               '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
)
def r6_asof_join(spark, sf_dir):
    """As-of join: for each purchase, the most recent click at-or-before
    it per user. Implemented join-free: tag clicks, one window pass with
    last(ignorenulls) — a single shuffle on user_id, vs the naive
    range-join's quadratic blowup."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_p"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.withColumn("last_click", F.last("click_ts", ignorenulls=True).over(w))
    return out.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.date_format("last_click", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
    )


@q(
    "r7_range_join",
    """
    SELECT lo, count(*) AS n_events
    FROM events
    JOIN (SELECT CAST(unnest(generate_series(0, 9)) * 50.0 AS DOUBLE) AS lo) b
      ON value >= lo AND value < lo + 50.0
    GROUP BY lo
    """,
)
def r7_range_join(spark, sf_dir):
    """Range (non-equi band) join: events into value buckets. The bucket
    dim is broadcast so the non-equi predicate is evaluated map-side
    (BroadcastNestedLoopJoin) — never a shuffled cartesian."""
    ev = load_table(spark, sf_dir, "events")
    buckets = spark.range(0, 10).select((F.col("id") * 50.0).alias("lo"))
    joined = ev.join(
        F.broadcast(buckets),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("lo") + 50.0),
    )
    return joined.groupBy("lo").agg(F.count("*").alias("n_events"))


# =============================================================================
# TPC-H-ish headline analytics (bench anchors)
# =============================================================================


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS DOUBLE) AS sum_qty,
           CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS DOUBLE) AS sum_base,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc,
           CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_disc,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy groupBy with arithmetic — the classic
    whole-stage-codegen benchmark. DECIMAL sums for portability."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base"),
            # 4dp product sums round in DECIMAL space (exact HALF_UP both
            # engines) — round(cast-to-double) flips on exact .xx5 sums
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc"),
            F.round(
                F.sum(dec("l_discount")).cast("double") / F.count("*"), 4
            ).alias("avg_disc"),
            F.count("*").alias("n"),
        )
    )


@q(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective 3-way join + agg + top-k. The customer
    filter prunes before the join; AQE picks broadcast for the dim side."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1998-03-15"
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        cust.join(od, cust.c_custkey == od.o_custkey)
        .join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@q(
    "q5_local_volume",
    """
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join with a same-nation constraint.
    Dims broadcast; the only large shuffles are the fact-fact join and the
    final small agg."""
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        cust.join(od, cust.c_custkey == od.o_custkey)
        .join(li, li.l_orderkey == od.o_orderkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )
