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
