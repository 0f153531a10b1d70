"""Round-10 corpus: closing the last rows-only gaps with full oracles.

First entry: the fixed-merge-count BPE value check (VERDICT r9 "Next
round" #3) — t14b/t26 were the oldest rows-only pair in the registry
because the merge loop is sequential; a FIXED merge budget unrolls as
CTEs with the g5/s2j discipline (each merge round = count pairs -> pick
argmax with total tie-break -> substitute), which makes the full
8-merge induction DuckDB-checkable end to end.

Reference anchor: the BPE surface extends the reference's text layer
(martech_pipelines/utils/data_sanity_helpers.py has only scalar string
ops); the tokenizer-induction workload is the north-star text-analysis
extension (SURVEY.md §7.3), semantics per Sennrich et al. 2016.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import text as TX
from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES, q  # noqa: F401
from martech_pipelines_spark.sources import load_table

_DUCK_TOKENS = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9'']+'), x -> x <> '')"
)

# =============================================================================
# t14c: BPE merge learning, fixed 8-merge budget — FULL oracle
# =============================================================================
#
# Word-in-progress representation (both engines conceptually): a word is
# its symbol sequence.  The oracle encodes it as a delimited string —
# '#' + sym + '#' per symbol, so adjacent symbols read "...a##b..." and
# the whole word reads "#a##b##c#" ('#' cannot occur inside a symbol:
# tokens are [a-z0-9'] only).  One merge round is then:
#
#   count:      explode adjacent (sym[i], sym[i+1]) pairs weighted by the
#               word frequency, sum per pair;
#   argmax:     ORDER BY pair_count DESC, left, right LIMIT 1 — the exact
#               Spark tie-break (corpus-total count, then lexicographic);
#   substitute: replace('#l##r#' -> '#lr#') — leftmost NON-overlapping
#               scanning (SQL replace never rescans its own output), which
#               is bit-equal to the engine's fold expression: a run of n
#               identical symbols merges floor(n/2) leftmost-first pairs,
#               and the consumed outer '#'s regenerate from the
#               replacement, so the representation stays consistent.
#
# The unroll is valid only while every round still has a pair with
# count >= 2 (the engine stops early when nothing repeats; the oracle
# cannot).  That holds with huge margin on the test corpora — pinned for
# both sf tiers in tests/test_r10_ops.py so a data regeneration that
# broke the precondition would fail loudly, not drift silently.


def _bpe_learn_ctes(n_merges: int) -> str:
    """The shared WITH-clause body: word-frequency table, delimited
    symbol strings, and one (count -> argmax -> substitute) CTE triple
    per merge round.  ``w{n}`` ends up as the fully-merged vocabulary
    (the original word ``w`` rides along so the encode oracle can join
    tokens back to their piece sequences)."""
    rounds = []
    for i in range(1, n_merges + 1):
        rounds.append(f"""
p{i} AS (
  SELECT l AS lft, r AS rgt, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
    SELECT syms[i] AS l, syms[i+1] AS r, cnt
    FROM (SELECT string_split(trim(s, '#'), '##') AS syms, cnt
          FROM w{i - 1}) t,
         unnest(range(1, len(syms))) AS u(i)
  ) GROUP BY 1, 2
),
m{i} AS (SELECT lft, rgt, pair_count FROM p{i}
         ORDER BY pair_count DESC, lft, rgt LIMIT 1),
w{i} AS (SELECT w, replace(s, '#' || lft || '##' || rgt || '#',
                           '#' || lft || rgt || '#') AS s, cnt
         FROM w{i - 1}, m{i})""")
    toks = _DUCK_TOKENS.format(col="text")
    return f"""
words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest({toks}) AS w FROM documents
  ) GROUP BY 1
),
w0 AS (SELECT w, regexp_replace(w, '(.)', '#\\1#', 'g') AS s, cnt FROM words),
{",".join(rounds)}"""


def _bpe_oracle(n_merges: int) -> str:
    unions = " UNION ALL ".join(
        f"SELECT CAST({i - 1} AS INTEGER) AS rank, lft AS left, rgt AS right,"
        f" pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
WITH {_bpe_learn_ctes(n_merges)}
{unions}
ORDER BY rank
"""


def _bpe_encode_oracle(n_merges: int) -> str:
    """Encode oracle: ``w{n}`` (the fully-merged vocab) IS the encode
    table — each word's piece sequence is its final delimited string
    split back apart.  Validity: the engine's apply loop merges the
    lowest-rank applicable pair one occurrence at a time; with a table
    LEARNED from this corpus, that is provably equal to applying the
    merges sequentially in rank order (merge k's constituents are
    produced only by merges < k, and a merge can only create new
    adjacencies INVOLVING its output symbol — whose merges all rank
    higher — so a completed rank never becomes applicable again).
    Documents join tokens (with ordinality) to the encoded vocab and
    re-concatenate pieces in token order; empty docs keep 0/'' via the
    left join."""
    toks = _DUCK_TOKENS.format(col="text")
    return f"""
WITH {_bpe_learn_ctes(n_merges)},
enc AS (
  SELECT w, string_split(trim(s, '#'), '##') AS pieces FROM w{n_merges}
),
tok AS (
  SELECT doc_id, toks[i] AS w, i
  FROM (SELECT doc_id, {toks} AS toks FROM documents) t,
       unnest(range(1, len(toks) + 1)) AS u(i)
),
per_doc AS (
  SELECT tok.doc_id, flatten(list(pieces ORDER BY i)) AS all_pieces
  FROM tok JOIN enc USING (w)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(len(all_pieces), 0) AS BIGINT) AS n_bpe_tokens,
       coalesce(array_to_string(list_slice(all_pieces, 1, 8), ' '), '')
         AS head_pieces
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


@q("t14c_bpe_fixed_merges", _bpe_oracle(8))
def t14c_bpe_fixed_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t14b's value-checked twin: the SAME 8-merge BPE induction
    (operators.text.bpe_learn_merges — corpus-sized work once in the
    word count, then vocab-sized pair-count/argmax/fold-substitute jobs
    per round), now against a fully unrolled DuckDB oracle so the merge
    SEQUENCE — argmax choices, deterministic tie-breaks, and the greedy
    leftmost substitution itself — is hash-checked, not just pytest-
    pinned on the paper example. t14b stays registered for driver-history
    continuity; this entry is the correctness anchor."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bpe_learn_merges(docs, n_merges=8)


@q("t26b_bpe_encode_fixed", _bpe_encode_oracle(8))
def t26b_bpe_encode_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t26's value-checked twin: the REAL Arrow encode kernel
    (operators.text.bpe_encode — merge table broadcast once, per-
    executor word cache, zero corpus shuffle) applied with the 8-merge
    table, against a full DuckDB oracle that encodes the VOCABULARY
    through the same unrolled substitution CTEs and joins tokens back
    by word.  This checks the apply loop's actual merge ORDER and
    piece boundaries — stronger than the reconstruction/no-residual
    invariants t26 pins in pytest."""
    docs = load_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn_merges(docs, n_merges=8)
    enc = TX.bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        "n_bpe_tokens",
        F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias("head_pieces"),
    )


# =============================================================================
# t54: sparse TF cosine top-k (postings self-join — the inverted-index
# twin of s3's dense-embedding near-dup)
# =============================================================================
#
# Unit = word TRIGRAM (the corpus vocabulary is ~31 words, so unigram/
# bigram postings are fully dense; trigrams give a ~27k-type sparse
# space).  Similarity = cos^2 in e6 fixed point — cos^2 = dot^2/(na*nb)
# is a MONOTONE transform of cosine on non-negative tf vectors and stays
# in 128-bit integer arithmetic end to end (DECIMAL(38,0) Spark-side,
# HUGEINT oracle-side; no sqrt, engine-exact for dot < ~3.2e15).  The posting
# self-join is banded by trigram with a df cap (_T54_DF_CAP) — the
# classic posting-prune that keeps pair work sum(df^2) bounded; the cap
# is inactive on the testdata (max df ~25 at sf0.1) but is the documented
# scale lever.  Never all-pairs.

_T54_K = 5
_T54_DF_CAP = 1000


def _t54_ctes() -> str:
    """Shared WITH-clause body ending in ``sp5`` (the ranked sparse
    top-k table) — reused by t54/h31's final SELECT and by s32's
    agreement join."""
    toks = _DUCK_TOKENS.format(col="text")
    return f"""toks AS (
  SELECT doc_id, {toks} AS t FROM documents
),
tf AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
    FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
  ) GROUP BY 1, 2
),
dft AS (
  SELECT g FROM (SELECT g, count(*) AS df FROM tf GROUP BY 1)
  WHERE df BETWEEN 2 AND {_T54_DF_CAP}
),
post AS (SELECT tf.* FROM tf JOIN dft USING (g)),
norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
          FROM post GROUP BY 1),
half AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM post a JOIN post b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sym AS (
  SELECT da AS doc_id, db AS nbr_id, dot FROM half
  UNION ALL
  SELECT db AS doc_id, da AS nbr_id, dot FROM half
),
scored AS (
  SELECT s.doc_id, s.nbr_id, s.dot,
         CAST((1000000::HUGEINT * s.dot * s.dot)
              // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT)
           AS cos2_e6
  FROM sym s
  JOIN norms na ON na.doc_id = s.doc_id
  JOIN norms nb ON nb.doc_id = s.nbr_id
),
sp5 AS (
  SELECT doc_id, nbr_id, dot, cos2_e6, CAST(rn AS BIGINT) AS rn FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id
        ORDER BY cos2_e6 DESC, dot DESC, nbr_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {_T54_K}
)"""


def _t54_oracle() -> str:
    return f"""
WITH {_t54_ctes()}
SELECT doc_id, nbr_id, dot, cos2_e6, rn FROM sp5
"""


def trigram_tf_state(docs: DataFrame) -> DataFrame:
    """The inverted-index STATE from a document batch: (doc_id, g, tf)
    trigram term frequencies.  Doc-partitioned batches compose by plain
    union (a document lands wholly in one batch, so its cells appear
    exactly once) — the h31 fold unit."""
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("t"))
    idx = F.when(
        F.size("t") >= 3, F.sequence(F.lit(1), F.size("t") - 2)
    ).otherwise(F.array().cast("array<int>"))
    tri = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("t", i),
                    F.element_at("t", i + 1),
                    F.element_at("t", i + 2),
                ),
            )
        ).alias("g"),
    )
    return tri.groupBy("doc_id", "g").agg(
        F.count("*").cast("long").alias("tf")
    )


def posting_pair_count(tf: DataFrame, df_cap: int = _T54_DF_CAP) -> int:
    """The EXACT posting-pair work the readout's self-join performs
    under a df cap: sum over surviving terms of C(df, 2).  This is the
    deterministic scale metric the sf1 gate pins (VERDICT r10 #2) —
    measured at sf0.1 / sf1: uncapped pair work grows ~109x for 10x
    data (1.27M -> 138.4M, the documented df^2 property) while cap=50
    holds it to 1.95x (1.27M -> 2.46M), i.e. the cap IS the lever."""
    row = (
        tf.groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df").between(2, df_cap))
        .agg(F.sum(F.expr("df * (df - 1) div 2")).alias("pairs"))
        .first()
    )
    return int(row["pairs"] or 0)


def sparse_topk_readout(
    tf: DataFrame, df_cap: int = _T54_DF_CAP
) -> DataFrame:
    """(doc_id, nbr_id, dot, cos2_e6, rn) from inverted-index state:
    df prune -> postings self-join by term -> integer cos^2 rank.  The
    df cap and norms are READOUT-time computations over merged state —
    incrementally maintained postings stay prune-agnostic, so a df that
    crosses the cap as the corpus grows is handled correctly."""
    from pyspark.sql import Window

    dft = (
        tf.groupBy("g")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df").between(2, df_cap))
        .select("g")
    )
    post = tf.join(dft, "g")
    norms = post.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2")
    )
    a, b = post.alias("a"), post.alias("b")
    half = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("long").alias("dot"))
    )
    sym = half.select(
        F.col("da").alias("doc_id"), F.col("db").alias("nbr_id"), "dot"
    ).unionByName(
        half.select(
            F.col("db").alias("doc_id"), F.col("da").alias("nbr_id"), "dot"
        )
    )
    scored = (
        sym.join(norms.select(F.col("doc_id"), F.col("n2").alias("__na")), "doc_id")
        .join(
            norms.select(
                F.col("doc_id").alias("nbr_id"), F.col("n2").alias("__nb")
            ),
            "nbr_id",
        )
        .withColumn(
            # 128-bit arithmetic on BOTH sides (DECIMAL(38,0) here,
            # HUGEINT in the oracle): long repetitive docs push dot past
            # ~3e6, where 1e6*dot^2 overflows BIGINT — DuckDB would
            # raise while pre-ANSI Spark wrapped silently (ADVICE r10).
            # Exact while 1e6*dot^2 < 1e38 (dot < ~3.2e15; by
            # Cauchy-Schwarz dot^2 <= na*nb, so equivalently
            # na*nb < 1e32) — verified identical on both engines.
            "cos2_e6",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * dot * dot)"
                " div (CAST(__na AS DECIMAL(38,0)) * __nb) AS LONG)"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("cos2_e6"), F.desc("dot"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= _T54_K)
        .select("doc_id", "nbr_id", "dot", "cos2_e6", "rn")
    )


@q("t54_sparse_cosine_topk", _t54_oracle())
def t54_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical top-k similarity — the inverted-index retrieval
    primitive (near-dup candidates, related-document panels) where s1/s3
    use dense embeddings: trigram tf vectors, posting lists self-joined
    BY TERM (shuffle keyed on the trigram, never a doc cross join), df
    cap as the posting-prune scale lever, and per-doc top-k by
    integer cos^2 e6 through a WindowGroupLimit-eligible keyed rank.
    Scale shape: pair work is sum(df^2) over capped terms; norms and
    dots are map-side-combined keyed aggs."""
    docs = load_table(spark, sf_dir, "documents")
    return sparse_topk_readout(trigram_tf_state(docs))


@q("h31_incremental_postings", _t54_oracle())
def h31_incremental_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t54 maintained INCREMENTALLY (SHARES t54's oracle — the IVM
    proof): the corpus split by doc-id parity into two ingest batches,
    each reduced to its own inverted-index state (trigram tf cells),
    composed by union (doc-partitioned batches: every document's cells
    land exactly once), then the SAME readout — so index maintenance
    never re-tokenizes history, while df pruning and norms stay
    readout-time and therefore correct as term frequencies drift across
    batches.  This is how a production near-dup/retrieval index absorbs
    a new crawl slice at 100 TB: tokenize the delta, append its cells,
    re-rank on demand."""
    docs = load_table(spark, sf_dir, "documents")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    state = trigram_tf_state(b1).unionByName(trigram_tf_state(b2))
    return sparse_topk_readout(state)


# =============================================================================
# dq16: Mann-Kendall trend test on daily volumes (integer-exact)
# =============================================================================
#
# S = sum over day pairs i<j of sign(c_j - c_i); the tie-corrected
# variance rides as var18 = 18*Var(S) = n(n-1)(2n+5) - sum t(t-1)(2t+5)
# so the |z| > 2 trend call becomes the pure-integer 9*S^2 > 2*var18.
# The pair join runs over the per-type DAY SPINE (~30 rows per type) —
# O(d^2) on a bounded spine, never over events.

_DQ16_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
                 AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY 1
    ), n AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily
        GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
              FROM daily GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - coalesce(t.tie_term, 0) AS BIGINT) AS var18,
           CASE WHEN 9 * s.s_stat * s.s_stat >
                     2 * (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                          - coalesce(t.tie_term, 0))
                THEN CASE WHEN s.s_stat > 0 THEN 'up' ELSE 'down' END
                ELSE 'none' END AS trend
    FROM n JOIN s USING (event_type) LEFT JOIN ties t USING (event_type)
"""


@q("dq16_trend_mann_kendall", _DQ16_ORACLE)
def dq16_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-trend detection on daily event volumes — the
    nonparametric drift alarm (is this feed ramping or decaying,
    without assuming linear growth or a distribution?) that completes
    the dq family's time axis: dq2 flags point anomalies, dq13
    compares populations across one split, this tests the WHOLE
    ordering.  Mann-Kendall S over the per-type day spine with the
    tie-corrected variance, folded to integer arithmetic (9*S^2 >
    2*var18 is exactly |z| > 2) so both engines agree bit-for-bit.
    Scale shape: events reduce map-side to the (type, day) spine; the
    O(days^2) pair join runs on ~30 rows per type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ).cast("long")
    out = n.join(s, "event_type").join(ties, "event_type", "left")
    return out.select(
        "event_type",
        "n_days",
        "s_stat",
        var18.alias("var18"),
        F.when(
            9 * F.col("s_stat") * F.col("s_stat") > 2 * var18,
            F.when(F.col("s_stat") > 0, "up").otherwise("down"),
        )
        .otherwise("none")
        .alias("trend"),
    )


# =============================================================================
# r40: mergeable histogram-quantile estimate (+ h30, its IVM twin)
# =============================================================================
#
# The deterministic, value-checkable member of the quantile family: r8
# computes exact percentiles (global), r8b the engine-specific
# approx_percentile (rows-only) — this one fixes a BIN GRID (width
# _R40_W cents) so the state is a mergeable (flag, bin, count) histogram
# and the estimate is pure integer interpolation: est = bin_lo +
# ((target_rank - cum_before) * W) div bin_count, target = ceil(n*p/100).
# Exactly the KMV-vs-HLL move (r3c) applied to quantile sketching: the
# production engine-specific sketch stays rows-only; the ALGORITHM class
# gets an engine-exact twin with a full oracle.

_R40_W = 10_000  # bin width: 10,000 cents = $100
_R40_PS = (50, 90, 99)

_R40_ORACLE = f"""
    WITH cents AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        FROM lineitem
    ), hist AS (
        SELECT flag, c // {_R40_W} AS bin, CAST(count(*) AS BIGINT) AS cnt
        FROM cents GROUP BY 1, 2
    ), cum AS (
        SELECT flag, bin, cnt,
               CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY bin) AS BIGINT)
                 AS cum,
               CAST(sum(cnt) OVER (PARTITION BY flag) AS BIGINT) AS n
        FROM hist
    ), targets AS (
        SELECT flag, n, p, (n * p + 99) // 100 AS target
        FROM (SELECT DISTINCT flag, n FROM cum),
             unnest([{", ".join(str(p) for p in _R40_PS)}]) AS u(p)
    )
    SELECT t.flag, CAST(t.p AS BIGINT) AS p, t.n,
           CAST(min(c.bin * {_R40_W}
                    + ((t.target - (c.cum - c.cnt)) * {_R40_W}) // c.cnt)
                AS BIGINT) AS est_cents
    FROM targets t JOIN cum c
      ON c.flag = t.flag AND c.cum >= t.target
         AND c.cum - c.cnt < t.target
    GROUP BY 1, 2, 3
"""


def price_histogram(li: DataFrame) -> DataFrame:
    """Mergeable quantile state from a lineitem batch: (flag, bin,
    cnt) cells on the fixed _R40_W-cent grid — additive across any
    batch split, the h30/streaming fold unit."""
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        li.select(
            F.col("l_returnflag").alias("flag"),
            (cents / _R40_W).cast("long").alias("bin"),
        )
        .groupBy("flag", "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two histogram states: cell-wise sum (commutative, so batch
    order can never matter)."""
    return (
        a.unionByName(b)
        .groupBy("flag", "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def histogram_quantile_readout(hist: DataFrame) -> DataFrame:
    """(flag, p, n, est_cents) from histogram state: keyed cumulative
    over per-flag bins (bins per flag are price-domain-bounded — a
    spine), then the integer interpolation at each target rank."""
    from pyspark.sql import Window

    w = Window.partitionBy("flag").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "flag",
        "bin",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
    )
    totals = hist.groupBy("flag").agg(F.sum("cnt").cast("long").alias("n"))
    targets = totals.select(
        "flag",
        "n",
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in _R40_PS])
        ).alias("p"),
    ).withColumn("target", F.expr("(n * p + 99) div 100"))
    hit = targets.join(
        cum,
        (targets["flag"] == cum["flag"])
        & (cum["cum"] >= targets["target"])
        & (cum["cum"] - cum["cnt"] < targets["target"]),
    )
    est = (
        F.col("bin") * _R40_W
        + F.expr(f"((target - (cum - cnt)) * {_R40_W}) div cnt")
    ).cast("long")
    return hit.groupBy(targets["flag"], "p", "n").agg(
        F.min(est).alias("est_cents")
    )


@q("r40_histogram_quantile", _R40_ORACLE)
def r40_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketching itself, value-checked: p50/p90/p99 prices per
    return flag from a fixed-grid mergeable histogram — build is ONE
    map-side-combined keyed agg over the fact table; the readout's only
    windows run per flag over the price-domain-bounded bin spine.  The
    engine-specific approx sketch (r8b) stays rows-only; this twin is
    the engine-exact algorithm-class anchor, and its state merges
    cell-wise (h30 shares this oracle as the IVM proof)."""
    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantile_readout(price_histogram(li))


@q("h30_incremental_histquant", _R40_ORACLE)
def h30_incremental_histquant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r40 maintained INCREMENTALLY (SHARES r40's oracle — the IVM
    proof): the fact table split by order-key parity into two batches,
    each reduced to its own histogram state, folded with the cell-wise
    sum — merge(state(A), state(B)) == state(A ∪ B) exactly because
    counter cells are commutative sums, so the quantile readout off
    merged state must equal the full recompute bit-for-bit.  At 100 TB
    each delta batch shuffles only its own pre-combined (flag, bin)
    cells; history is never re-scanned."""
    li = load_table(spark, sf_dir, "lineitem")
    b1 = li.where(F.col("l_orderkey") % 2 == 0)
    b2 = li.where(F.col("l_orderkey") % 2 == 1)
    state = histogram_merge(price_histogram(b1), price_histogram(b2))
    return histogram_quantile_readout(state)


# =============================================================================
# g8: fixed-round BFS hop distances (single-source shortest paths)
# =============================================================================

_G8_ROUNDS = 4


def _g8_oracle() -> str:
    blocks = [
        """li AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
    ), seed AS (
        SELECT src AS node FROM (
            SELECT src, count(*) AS deg FROM edges GROUP BY 1
            ORDER BY deg DESC, src ASC LIMIT 1
        )
    ), d0 AS (
        SELECT node, CAST(0 AS BIGINT) AS hops FROM seed
    )"""
    ]
    for i in range(_G8_ROUNDS):
        blocks.append(
            f"""d{i + 1} AS (
        SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM (
            SELECT node, hops FROM d{i}
            UNION ALL
            SELECT e.dst AS node, d.hops + 1 AS hops
            FROM d{i} d JOIN edges e ON e.src = d.node
        ) GROUP BY 1
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"\n    SELECT node, hops FROM d{_G8_ROUNDS}\n"
    )


@q("g8_bfs_hops", _g8_oracle())
def g8_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS — the reachability/how-far primitive the
    fixed-round graph family still lacked (g1 ranks, g2 counts, g4/g5
    label, g6 peels, g7 profiles; none answers "how many hops from
    HERE?"): exact hop distances from the max-degree co-purchase node
    (deterministic seed: degree desc, id asc) within {_G8_ROUNDS}
    rounds of SYNC frontier expansion.  Per round one keyed
    dist-against-edges join + a map-side-combined min — the g5
    currency; the seed is a 1-row control-plane relation.  Unreached
    nodes are absent, so the result is frontier-sized, not
    graph-sized."""
    from martech_pipelines_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    seed = (
        edges.groupBy("src")
        .agg(F.count("*").alias("__deg"))
        .orderBy(F.desc("__deg"), F.asc("src"))
        .limit(1)
        .select(F.col("src").alias("node"))
    )
    return G.bfs_hops_rounds(edges, seed, rounds=_G8_ROUNDS).select(
        "node", "hops"
    )


# =============================================================================
# dq17: Sen's slope (the magnitude companion to dq16's Mann-Kendall)
# =============================================================================
#
# Median of all pairwise slopes (c_j - c_i)/(d_j - d_i) over the per-type
# day spine.  Ordering uses floor(1e6*dy/dx) — dx is positive integer
# days, the double division is IEEE-identical in both engines — with a
# (dy, dx, d_i, d_j) tiebreak so the median ELEMENT is engine-exact; the
# lower median ((m+1) div 2) keeps selection integer.  O(days^2) pairs on
# a ~30-row spine per type — never over events.

_DQ17_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type,
               CAST(b.c - a.c AS BIGINT) AS dy,
               CAST(date_diff('day', a.d, b.d) AS BIGINT) AS dx,
               a.d AS d1, b.d AS d2
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    ), ranked AS (
        SELECT event_type,
               CAST(floor(1000000.0 * dy / dx) AS BIGINT) AS slope_e6,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY floor(1000000.0 * dy / dx), dy, dx, d1, d2
               ) AS rn,
               count(*) OVER (PARTITION BY event_type) AS m
        FROM pairs
    )
    SELECT event_type, CAST(m AS BIGINT) AS n_pairs, slope_e6
    FROM ranked WHERE rn = (m + 1) // 2
"""


@q("dq17_sen_slope", _DQ17_ORACLE)
def dq17_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sen's slope estimator — the robust trend MAGNITUDE that pairs
    with dq16's Mann-Kendall direction call (the two are the standard
    nonparametric trend kit: dq16 says WHETHER the feed drifts, this
    says HOW FAST, immune to outlier days that wreck a least-squares
    fit): the lower median of all pairwise day-count slopes per event
    type, as e6 fixed point.  Scale shape: events reduce map-side to
    the (type, day) spine; the O(days^2) pair join and the median
    rank run per type over ~30-row spines (keyed windows)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.c") - F.col("a.c")).cast("long").alias("dy"),
        F.datediff(F.col("b.d"), F.col("a.d")).cast("long").alias("dx"),
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
    )
    slope = F.floor(F.lit(1000000.0) * F.col("dy") / F.col("dx")).cast("long")
    w = Window.partitionBy("event_type").orderBy(
        slope, F.col("dy"), F.col("dx"), F.col("d1"), F.col("d2")
    )
    wm = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        slope.alias("slope_e6"),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wm).alias("__m"),
    )
    return ranked.where(
        # Integer division (div), NOT `/`: Spark `/` is double division,
        # so an even pair count (m+1 odd -> target x.5) would match no
        # row and silently drop the event type (ADVICE r10, high).  The
        # oracle's `//` is integer; `div` is its Spark twin.
        F.col("__rn") == F.expr("(__m + 1) div 2")
    ).select(
        "event_type", F.col("__m").cast("long").alias("n_pairs"), "slope_e6"
    )


# =============================================================================
# fe6: feature hashing (the hashing trick) — fixed-dim sparse vectors
# =============================================================================
#
# The Weinberger et al. 2009 featurizer every large-scale linear model
# ingests: token -> slot via one hash, a second independent hash picks
# the sign (+1/-1, the collision-debiasing trick), weights sum per
# (doc, slot).  Both hashes derive from the engine's single md5 idiom,
# so the whole vectorization is engine-exact.  D is a constant —
# output is at most |docs| x D, and the build is one map-side-combined
# keyed agg off the token explode.

_FE6_D = 64


def _fe6_oracle() -> str:
    toks = _DUCK_TOKENS.format(col="text")
    h = "('0x' || substr(md5('{salt}:' || w), 1, 8))::BIGINT"
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest({toks}) AS w FROM documents
    ), hashed AS (
        SELECT doc_id,
               {h.format(salt='fh')} % {_FE6_D} AS slot,
               CASE WHEN {h.format(salt='fs')} % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok
    )
    SELECT doc_id, CAST(slot AS BIGINT) AS slot,
           CAST(sum(sgn) AS BIGINT) AS weight
    FROM hashed GROUP BY 1, 2
    HAVING sum(sgn) <> 0
    """


@q("fe6_feature_hashing", _fe6_oracle())
def fe6_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing — the fixed-dimension featurizer that makes
    unbounded vocabularies trainable without a dictionary (no vocab
    collect, no index fit: any executor can hash any token, which is
    exactly why it scales): slot = h(token) mod D, sign = second hash,
    signed counts summed per (doc, slot), zero-sum cells dropped.
    Complements fe4 (target encoding needs labels + a fitted map) and
    pipe6 (tokenize-pack needs a trained vocab) as the stateless lane
    of the feature family."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("w")
    )
    slot = (TX.md5_bucket32(F.col("w"), "fh") % _FE6_D).alias("slot")
    sgn = F.when(
        TX.md5_bucket32(F.col("w"), "fs") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        tok.select("doc_id", slot, sgn.alias("__sgn"))
        .groupBy("doc_id", "slot")
        .agg(F.sum("__sgn").cast("long").alias("weight"))
        .where(F.col("weight") != 0)
        .select("doc_id", F.col("slot").cast("long").alias("slot"), "weight")
    )


# =============================================================================
# mart28: first-order journey transition matrix (+ h32, its IVM twin)
# =============================================================================
#
# Transition counts over consecutive event pairs per user in total
# (ts, event_id) order, and the per-source transition probability as
# half-up e6.  mart12 histograms whole paths, mart24 regex-matches one
# pattern; this is the Markov-view of the same journeys — the input to
# every transition-graph/attribution analysis.

_MART28_ORACLE = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ), cells AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS n_trans
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), rowtot AS (
        SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS row_total
        FROM cells GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n_trans, r.row_total,
           CAST((c.n_trans * 2000000 + r.row_total) // (2 * r.row_total)
                AS BIGINT) AS p_e6
    FROM cells c JOIN rowtot r USING (from_type)
"""


def transition_cells(ev: DataFrame) -> DataFrame:
    """(from_type, to_type, n_trans) cells from an event batch: one
    keyed window (per-user, total (ts, event_id) order) + a map-side-
    combined count.  The h32 fold unit — WITHIN-batch transitions only;
    boundary pairs are the merge's job."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return nxt.where(F.col("to_type").isNotNull()).groupBy(
        "from_type", "to_type"
    ).agg(F.count("*").cast("long").alias("n_trans"))


def transition_bounds(ev: DataFrame) -> DataFrame:
    """Per-user (first_type, last_type) in total (ts, event_id) order —
    the skinny boundary state that lets time-split batches merge
    exactly: the stitch transition between consecutive batches is
    (earlier.last_type -> later.first_type)."""
    return ev.groupBy("user_id").agg(
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("first_type"),
        F.max_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("last_type"),
    )


def transition_readout(cells: DataFrame) -> DataFrame:
    """Probability readout over transition cells: row totals broadcast
    back (event-type-bounded spine), half-up e6 shares."""
    rowtot = cells.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("row_total")
    )
    return (
        cells.join(F.broadcast(rowtot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_trans",
            "row_total",
            F.expr(
                "(n_trans * 2000000 + row_total) div (2 * row_total)"
            ).cast("long").alias("p_e6"),
        )
    )


@q("mart28_journey_transitions", _MART28_ORACLE)
def mart28_journey_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order journey transition matrix — the Markov view of user
    paths (what follows a view? how often does a click die?) that
    transition-graph attribution and funnel-leak analysis start from.
    Scale shape: ONE user-keyed shuffle for the lead window, then
    event-type-bounded cells; the probability join is a broadcast over
    the |types|^2 spine."""
    ev = load_table(spark, sf_dir, "events")
    return transition_readout(transition_cells(ev))


@q("h32_incremental_transitions", _MART28_ORACLE)
def h32_incremental_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mart28 maintained INCREMENTALLY (SHARES mart28's oracle) with a
    GENUINELY stitched merge: the event log ts-splits into two batches,
    each reduced to (cells, per-user first/last bounds); the fold adds
    the boundary transitions (earlier.last -> later.first, per user
    present in BOTH batches) that neither batch sees — the part a naive
    cells-only sum would silently drop.  This is the windowed-state
    pattern every cross-batch sequence metric needs at 100 TB: history
    reduces to |users| boundary rows, never re-scanned."""
    ev = load_table(spark, sf_dir, "events")
    cut_us = 1705276800000000  # 2024-01-15T00:00:00Z (integer micros)
    b1 = ev.where(F.unix_micros("ts") < F.lit(cut_us))
    b2 = ev.where(F.unix_micros("ts") >= F.lit(cut_us))
    stitch = (
        transition_bounds(b1)
        .select("user_id", F.col("last_type").alias("from_type"))
        .join(
            transition_bounds(b2).select(
                "user_id", F.col("first_type").alias("to_type")
            ),
            "user_id",
        )
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n_trans"))
    )
    cells = (
        transition_cells(b1)
        .unionByName(transition_cells(b2))
        .unionByName(stitch)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n_trans").cast("long").alias("n_trans"))
    )
    return transition_readout(cells)


# =============================================================================
# t56: PII redaction — the TRANSFORM that t48's profile gates
# =============================================================================
#
# t48 reports which sources need scrubbing; this is the scrub itself,
# value-checked to the BYTE: the same injected-PII corpus (the t48
# convention — the synthetic text carries no natural PII), the same
# three patterns, replaced in a fixed order (emails, then URLs, then
# phones — URLs go before phones so digits inside a redacted URL can
# never be re-matched as a phone), and the output carries
# md5(redacted_text) so the comparison pins the transform's full
# content, not just its counts.

_T56_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_T56_PHONE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"
_T56_URL = r"https?://[^\s]+"


def _t56_corpus_sql() -> str:
    return """
        SELECT doc_id,
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
    """


def _t56_oracle() -> str:
    return f"""
    WITH corpus AS ({_t56_corpus_sql()}),
    red AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_T56_EMAIL}'))
                    + len(regexp_extract_all(
                          regexp_replace(text, '{_T56_EMAIL}', '[EMAIL]', 'g'),
                          '{_T56_URL}'))
                    + len(regexp_extract_all(
                          regexp_replace(
                              regexp_replace(text, '{_T56_EMAIL}', '[EMAIL]', 'g'),
                              '{_T56_URL}', '[URL]', 'g'),
                          '{_T56_PHONE}')) AS BIGINT) AS n_redactions,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_T56_EMAIL}', '[EMAIL]', 'g'),
                       '{_T56_URL}', '[URL]', 'g'),
                   '{_T56_PHONE}', '[PHONE]', 'g') AS redacted
        FROM corpus
    )
    SELECT doc_id, n_redactions, md5(redacted) AS redacted_md5
    FROM red
    """


@q("t56_pii_redaction", _t56_oracle())
def t56_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrub-before-training TRANSFORM (most
    hygiene entries are reports; this one rewrites the text and proves
    the rewrite): emails/URLs/phones replaced by typed placeholders in
    a fixed sequence, per-doc redaction count plus md5 of the redacted
    text.  Pure codegen'd regexp_replace chain — no Python, no
    shuffle beyond the scan; both engines evaluate identical regex
    strings and the md5 pins byte equality of the transformed corpus."""
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
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
    )
    step1 = F.regexp_replace(injected, _T56_EMAIL, "[EMAIL]")
    step2 = F.regexp_replace(step1, _T56_URL, "[URL]")
    step3 = F.regexp_replace(step2, _T56_PHONE, "[PHONE]")
    n_red = (
        F.regexp_count(injected, F.lit(_T56_EMAIL))
        + F.regexp_count(step1, F.lit(_T56_URL))
        + F.regexp_count(step2, F.lit(_T56_PHONE))
    ).cast("long")
    return docs.select(
        "doc_id",
        n_red.alias("n_redactions"),
        F.md5(step3).alias("redacted_md5"),
    )


# =============================================================================
# t57: within-document repetition removal (C4's intra-doc dedup), the
# second value-checked transform
# =============================================================================

_T57_K = 10  # chunk size in tokens (the dd11 paragraph unit)


def _t57_oracle() -> str:
    toks = _DUCK_TOKENS.format(col="text")
    return f"""
    WITH toks AS (
        SELECT doc_id, {toks} AS t FROM documents
    ), chunks AS (
        SELECT doc_id, u.i AS i,
               array_to_string(
                   t[CAST(u.i * {_T57_K} + 1 AS INTEGER)
                     :CAST(u.i * {_T57_K} + {_T57_K} AS INTEGER)], ' ') AS ch
        FROM toks,
             unnest(range(0, (len(t) + {_T57_K - 1}) // {_T57_K})) u(i)
    ), firsts AS (
        SELECT doc_id, ch, min(i) AS mi FROM chunks GROUP BY 1, 2
    ), folded AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_kept,
               md5(array_to_string(list(ch ORDER BY mi), ' ')) AS kept_md5
        FROM firsts GROUP BY 1
    ), totals AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM chunks
        GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(t.n_chunks, 0) AS n_chunks,
           coalesce(f.n_kept, 0) AS n_kept,
           coalesce(f.kept_md5, md5('')) AS kept_md5
    FROM documents d
    LEFT JOIN totals t USING (doc_id) LEFT JOIN folded f USING (doc_id)
    """


@q("t57_intradoc_dedup", _t57_oracle())
def t57_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition removal — the C4-style intra-doc
    dedup TRANSFORM (dd11 deduplicates chunks ACROSS the corpus; this
    drops repeats INSIDE each document, the boilerplate/loop-text
    scrub): fixed {_T57_K}-token chunks, first occurrence kept in
    order, output pinned by md5 of the kept text.  Spark side is pure
    scalar expressions — paragraph_chunks + array_distinct (first-
    occurrence order-preserving; the oracle re-derives it with an
    explicit min-ordinality fold, so an order regression in either
    engine hash-fails) — zero shuffles beyond the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("t"))
    chunks = toks.select(
        "doc_id", TX.paragraph_chunks(F.col("t"), k=_T57_K).alias("chs")
    )
    kept = F.array_distinct("chs")
    return chunks.select(
        "doc_id",
        F.size("chs").cast("long").alias("n_chunks"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(F.array_join(kept, " ")).alias("kept_md5"),
    )


# =============================================================================
# pipe14: end-to-end curation pipeline (redact -> intra-doc dedup ->
# quality gate -> corpus-level exact dedup), value-checked per stage
# =============================================================================
#
# The composition showcase: every stage is one of this round's
# value-checked transforms, chained the way a real pre-training curation
# job runs them, and the per-source funnel report carries exact counts
# at each gate plus the surviving token mass.  Everything is columnar
# expressions + two keyed aggs — the corpus is scanned once.

_PIPE14_MIN_TOKENS = 20


def _pipe14_oracle() -> str:
    toks_clean = _DUCK_TOKENS.format(col="clean")
    return f"""
    WITH corpus AS (
        SELECT c.doc_id, d.source, c.text
        FROM ({_t56_corpus_sql()}) c JOIN documents d USING (doc_id)
    ), red AS (
        SELECT doc_id, source,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_T56_EMAIL}', '[EMAIL]', 'g'),
                       '{_T56_URL}', '[URL]', 'g'),
                   '{_T56_PHONE}', '[PHONE]', 'g') AS rtext
        FROM corpus
    ), toks AS (
        SELECT doc_id, source,
               {_DUCK_TOKENS.format(col='rtext')} AS t
        FROM red
    ), chunks AS (
        SELECT doc_id, source, u.i AS i,
               array_to_string(
                   t[CAST(u.i * {_T57_K} + 1 AS INTEGER)
                     :CAST(u.i * {_T57_K} + {_T57_K} AS INTEGER)], ' ') AS ch
        FROM toks,
             unnest(range(0, (len(t) + {_T57_K - 1}) // {_T57_K})) u(i)
    ), firsts AS (
        SELECT doc_id, source, ch, min(i) AS mi FROM chunks GROUP BY 1, 2, 3
    ), cleaned AS (
        SELECT doc_id, source,
               array_to_string(list(ch ORDER BY mi), ' ') AS clean
        FROM firsts GROUP BY 1, 2
    ), gated AS (
        SELECT doc_id, source, clean,
               CAST(len({toks_clean}) AS BIGINT) AS n_tokens
        FROM cleaned
    ), quality AS (
        SELECT * FROM gated WHERE n_tokens >= {_PIPE14_MIN_TOKENS}
    ), kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY md5(clean) ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS docs_in,
           CAST(coalesce(q.n_q, 0) AS BIGINT) AS docs_quality,
           CAST(coalesce(k.n_k, 0) AS BIGINT) AS docs_kept,
           CAST(coalesce(k.tok, 0) AS BIGINT) AS tokens_kept
    FROM corpus c
    LEFT JOIN (SELECT source, count(*) AS n_q FROM quality GROUP BY 1) q
      USING (source)
    LEFT JOIN (SELECT source, count(*) AS n_k, sum(n_tokens) AS tok
               FROM kept GROUP BY 1) k USING (source)
    GROUP BY 1, q.n_q, k.n_k, k.tok
    """


@q("pipe14_curation_e2e", _pipe14_oracle())
def pipe14_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline END TO END — redaction (t56), within-doc
    repetition removal (t57), a minimum-token quality gate, and
    corpus-level exact dedup (keep-lowest-doc-id per cleaned-text
    hash), reported as a per-source funnel with surviving token mass.
    This is the composition a pre-training data job actually runs, and
    every intermediate is one of this round's value-checked transforms,
    so the whole chain is hash-checked — not just each stage in
    isolation.  Scale shape: one scan; the only shuffles are the
    chunk-fold (doc-keyed), the dedup hash agg, and the 5-row source
    report."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
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
    )
    rtext = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(injected, _T56_EMAIL, "[EMAIL]"),
            _T56_URL,
            "[URL]",
        ),
        _T56_PHONE,
        "[PHONE]",
    )
    toks = docs.select(
        "doc_id", "source", TX.tokens(rtext).alias("t")
    )
    kept_chunks = F.array_distinct(
        TX.paragraph_chunks(F.col("t"), k=_T57_K)
    )
    cleaned = toks.select(
        "doc_id",
        "source",
        F.array_join(kept_chunks, " ").alias("clean"),
    )
    gated = cleaned.withColumn(
        "n_tokens", F.size(TX.tokens(F.col("clean"))).cast("long")
    )
    quality = gated.where(F.col("n_tokens") >= _PIPE14_MIN_TOKENS)
    w = Window.partitionBy(F.md5("clean")).orderBy("doc_id")
    kept = quality.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    src_in = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_in")
    )
    src_q = quality.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_quality")
    )
    src_k = kept.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_kept"),
        F.sum("n_tokens").cast("long").alias("tokens_kept"),
    )
    return (
        src_in.join(src_q, "source", "left")
        .join(src_k, "source", "left")
        .select(
            "source",
            "docs_in",
            F.coalesce("docs_quality", F.lit(0)).cast("long").alias(
                "docs_quality"
            ),
            F.coalesce("docs_kept", F.lit(0)).cast("long").alias("docs_kept"),
            F.coalesce("tokens_kept", F.lit(0)).cast("long").alias(
                "tokens_kept"
            ),
        )
    )


# =============================================================================
# h33: dq16's IVM twin — trend state maintained as mergeable day cells
# =============================================================================


@q("h33_incremental_trend", _DQ16_ORACLE)
def h33_incremental_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dq16 maintained INCREMENTALLY (SHARES dq16's oracle): the event
    log ts-splits into two batches, each reduced to (type, day, count)
    cells — additive, so the merged spine equals the full recompute's —
    and the O(days^2) Mann-Kendall readout reruns on the merged
    ~30-row-per-type spine.  The 100-TB shape for EVERY pair-statistic
    over a bounded axis: the quadratic part is constant-cost readout,
    the data-scale part is a mergeable reduction, history never
    re-scans."""
    ev = load_table(spark, sf_dir, "events")
    cut_us = 1705276800000000  # 2024-01-15T00:00:00Z (integer micros)
    cells = (
        ev.withColumn(
            "__half",
            (F.unix_micros("ts") >= F.lit(cut_us)).cast("int"),
        )
        .groupBy("event_type", F.col("ts").cast("date").alias("d"), "__half")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("event_type", "d")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = cells.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    ties = (
        cells.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ).cast("long")
    out = n.join(s, "event_type").join(ties, "event_type", "left")
    return out.select(
        "event_type",
        "n_days",
        "s_stat",
        var18.alias("var18"),
        F.when(
            9 * F.col("s_stat") * F.col("s_stat") > 2 * var18,
            F.when(F.col("s_stat") > 0, "up").otherwise("down"),
        )
        .otherwise("none")
        .alias("trend"),
    )


# =============================================================================
# s32: lexical-vs-dense retrieval agreement (overlap@5 histogram)
# =============================================================================
#
# The cross-family eval: for the s1 query subset (every 10th id), how
# much do t54's lexical (trigram-tf cosine) and s1's dense (embedding
# cosine) top-5 neighbor sets agree?  Low overlap on a real corpus
# means the two retrievers are complementary (the reason RRF fusion —
# s24 — exists); the report is the overlap histogram.  Dense side:
# brute-force top-6 WITH self, drop self, keep 5 — exact regardless of
# cos=1.0 ties (if self is in the top 6, removing it leaves the best 5
# others; if not, the first 5 already are).

_S32_ORACLE = f"""
WITH {_t54_ctes()},
q AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id % 10 = 0
), dscored AS (
    SELECT q.query_id, e.vec_id,
           round(
               list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))),
               4) AS cos_sim
    FROM q CROSS JOIN embeddings e
), d6 AS (
    SELECT query_id, vec_id, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
        FROM dscored WHERE cos_sim IS NOT NULL
    ) WHERE rnk <= 6
), d5 AS (
    SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rnk) AS rn
        FROM d6 WHERE vec_id <> query_id
    ) WHERE rn <= 5
), base AS (
    SELECT DISTINCT doc_id FROM sp5 WHERE doc_id % 10 = 0
), ov AS (
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS c
    FROM sp5 s JOIN d5 d ON d.query_id = s.doc_id AND d.vec_id = s.nbr_id
    WHERE s.doc_id % 10 = 0
    GROUP BY 1
)
SELECT CAST(coalesce(o.c, 0) AS BIGINT) AS overlap,
       CAST(count(*) AS BIGINT) AS n_docs
FROM base b LEFT JOIN ov o USING (doc_id)
GROUP BY 1
"""


@q("s32_lexical_dense_agreement", _S32_ORACLE)
def s32_lexical_dense_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often do lexical and semantic retrieval agree?  The
    overlap@5 histogram between t54's inverted-index neighbors and the
    exact dense-cosine neighbors on the s1 query subset — the
    diagnostic that motivates hybrid retrieval (s24's RRF fusion):
    high overlap means one retriever is redundant, low overlap means
    fuse.  Scale shape: the sparse side is t54's banded postings join;
    the dense side broadcasts the bounded query set; the agreement join
    is keyed on (query, neighbor) pairs — 5 rows per query both sides."""
    from pyspark.sql import Window

    from martech_pipelines_spark.operators import similarity as SIM

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sp5 = sparse_topk_readout(trigram_tf_state(docs)).where(
        F.col("doc_id") % 10 == 0
    )
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    d6 = SIM.brute_force_topk(queries, emb, k=6)
    w = Window.partitionBy("query_id").orderBy("rnk")
    d5 = (
        d6.where(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id")
    )
    base = sp5.select("doc_id").distinct()
    ov = (
        sp5.join(
            d5,
            (d5["query_id"] == sp5["doc_id"]) & (d5["vec_id"] == sp5["nbr_id"]),
        )
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        base.join(ov, "doc_id", "left")
        .select(F.coalesce("c", F.lit(0)).cast("long").alias("overlap"))
        .groupBy("overlap")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# =============================================================================
# s33: embedding-cell label purity (cluster quality vs ground truth)
# =============================================================================
#
# The eval that closes the clustering loop: s2j trains clusters, s26
# audits cell balance — this one scores cells AGAINST THE LABEL column
# (the supervised ground truth the embeddings table carries): per
# 4-bit sign-cell (sign of dims 1-4 — a fixed-axis SimHash, fully
# deterministic), the majority label and its half-up e6 purity.  Low
# purity = the embedding space doesn't separate the classes at that
# granularity; the report is what a training-data curator reads before
# trusting embedding-based dedup/sampling on a labeled corpus.

_S33_ORACLE = """
    WITH c AS (
        SELECT label,
               CAST(embedding[1] > 0 AS INT) + 2 * CAST(embedding[2] > 0 AS INT)
               + 4 * CAST(embedding[3] > 0 AS INT)
               + 8 * CAST(embedding[4] > 0 AS INT) AS cell
        FROM embeddings
    ), per AS (
        SELECT cell, label, CAST(count(*) AS BIGINT) AS cnt
        FROM c GROUP BY 1, 2
    ), tot AS (
        SELECT cell, CAST(sum(cnt) AS BIGINT) AS n_vecs FROM per GROUP BY 1
    ), maj AS (
        SELECT cell, label AS majority_label, cnt AS majority_count FROM (
            SELECT *, row_number() OVER (
                PARTITION BY cell ORDER BY cnt DESC, label ASC) AS rn
            FROM per
        ) WHERE rn = 1
    )
    SELECT CAST(t.cell AS BIGINT) AS cell, t.n_vecs,
           CAST(m.majority_label AS BIGINT) AS majority_label,
           m.majority_count,
           CAST((m.majority_count * 2000000 + t.n_vecs) // (2 * t.n_vecs)
                AS BIGINT) AS purity_e6
    FROM tot t JOIN maj m USING (cell)
"""


@q("s33_cell_label_purity", _S33_ORACLE)
def s33_cell_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label purity per embedding sign-cell — supervised cluster-quality
    scoring over the labeled vector table: 16 fixed-axis cells (sign
    bits of dims 1-4), majority label with deterministic tie-break
    (count desc, label asc), half-up e6 purity.  Scale shape: one
    map-side-combined (cell, label) count; every later step runs on the
    16-row cell spine.  Complements s26 (balance, unsupervised) and
    s31 (recall vs truncation) as the labeled-corpus eval."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    bit = lambda i: (F.element_at("embedding", i) > 0).cast("int")  # noqa: E731
    cell = (bit(1) + 2 * bit(2) + 4 * bit(3) + 8 * bit(4)).alias("cell")
    per = emb.select(cell, "label").groupBy("cell", "label").agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = per.groupBy("cell").agg(F.sum("cnt").cast("long").alias("n_vecs"))
    w = Window.partitionBy("cell").orderBy(F.desc("cnt"), F.asc("label"))
    maj = (
        per.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "cell",
            F.col("label").cast("long").alias("majority_label"),
            F.col("cnt").alias("majority_count"),
        )
    )
    return tot.join(maj, "cell").select(
        F.col("cell").cast("long").alias("cell"),
        "n_vecs",
        "majority_label",
        "majority_count",
        F.expr("(majority_count * 2000000 + n_vecs) div (2 * n_vecs)")
        .cast("long")
        .alias("purity_e6"),
    )


# =============================================================================
# dq18: per-source column-completeness matrix
# =============================================================================

_DQ18_SHORT = 20  # chars; "suspiciously short" document threshold

_DQ18_ORACLE = f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_text,
           CAST(sum(CASE WHEN text IS NOT NULL AND trim(text) = ''
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_text,
           CAST(sum(CASE WHEN n_chars < {_DQ18_SHORT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_short,
           CAST(sum(CASE WHEN lang IS NULL OR trim(lang) = ''
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lang,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_len_mismatch
    FROM documents GROUP BY 1
"""


@q("dq18_completeness_matrix", _DQ18_ORACLE)
def dq18_completeness_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source column-completeness matrix — the intake audit a crawl
    source passes before entering curation (dp1 profiles ONE entity
    deeply; this scans the ingest surface wide): null/blank text,
    suspiciously-short docs, missing language tags, language-tag
    cardinality, and n_chars-vs-actual-length mismatches (the
    metadata-drift tell when an upstream re-encodes text but forgets
    the stats column).  One map-side-combined agg; |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    blank = F.col("text").isNotNull() & (F.trim("text") == "")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("text").isNull().cast("int")).cast("long").alias(
            "n_null_text"
        ),
        F.sum(blank.cast("int")).cast("long").alias("n_blank_text"),
        F.sum((F.col("n_chars") < _DQ18_SHORT).cast("int"))
        .cast("long")
        .alias("n_short"),
        F.sum(
            (F.col("lang").isNull() | (F.trim("lang") == "")).cast("int")
        )
        .cast("long")
        .alias("n_no_lang"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum((F.length("text") != F.col("n_chars")).cast("int"))
        .cast("long")
        .alias("n_len_mismatch"),
    )
