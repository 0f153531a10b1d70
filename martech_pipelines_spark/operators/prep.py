"""Materialized training-data prep index (pipe10's 100-TB form).

``pipe10_prep_funnel`` re-derives every stage from raw text per run:
quality/language scoring, the exact-dedup fingerprint, and the 8-gram
decontamination windows each re-scan and re-tokenize the corpus — fine
for a one-off report, linear-in-corpus at every refresh (56 s at sf1 in
BENCH_sf1.json, ~100% of it text passes).  This module is the
dd3c/t19b materialization pattern applied to the whole prep pipeline:

* stage 1 (``prep_index_build``) scans the raw text ONCE and writes two
  skinny parquet tables —

  - ``doc_stats``: one row per document with the quality/language keep
    flag and the exact-dedup fingerprint (md5 of normalized text).
    ~50 bytes/doc regardless of document size.
  - ``win_hashes``: distinct (doc_id, h) 8-gram window hashes for every
    document.  The only O(corpus-token) table, but it stores 16-byte
    hashes, not text, and is written with map-side-combined distinct.

* stage 2 (``prep_funnel_report``) answers the funnel report reading
  ONLY those tables: raw/kept counts and the dedup survivors come from
  ``doc_stats`` (a window over 32-byte fingerprints), the
  decontamination stage is a semi-join of ``win_hashes`` against the
  broadcast distinct eval-hash set — no regex, no tokenizer, no raw
  document bytes anywhere in the probe plan (plan-asserted in
  tests/test_plans.py).

Bit-equal to the inline ``pipe10_prep_funnel`` by construction (same
keep predicate, same fingerprint, same window hashing), hence the
shared oracle.  Reference parity: the reference has no corpus-prep
surface at all — this extends the engine's LLM-pipeline family
(SURVEY.md §2 "beyond-reference" scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators import text as TX

__all__ = [
    "prep_index_build",
    "prep_index_append",
    "prep_index_compact",
    "apply_prep_index_batch",
    "prep_funnel_report",
    "prep_funnel_inline_base",
]


def prep_funnel_inline_base(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The shared quality+language keep predicate of the prep funnel
    (pipe10 stage 1), exposed so the inline and materialized forms can
    never drift apart."""
    return docs.where(
        (F.length(text_col) > 0)
        & (TX.token_count(F.col(text_col)) > 0)
        & (TX.lang_id(F.col(text_col)) == "en")
        & (TX.quality_score(F.col(text_col)) >= 0.4)
    )


def _doc_stats_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, kept, fp) — the per-document index row (shared by the
    batch build, the incremental append, and the streaming maintainer,
    so the three paths can never drift)."""
    kept_flag = (
        (F.length(text_col) > 0)
        & (TX.token_count(F.col(text_col)) > 0)
        & (TX.lang_id(F.col(text_col)) == "en")
        & (TX.quality_score(F.col(text_col)) >= 0.4)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        kept_flag.alias("kept"),
        TX.fingerprint(F.col(text_col)).alias("fp"),
    )


def _win_hash_frame(
    docs: DataFrame, w: int, text_col: str, id_col: str
) -> DataFrame:
    """Distinct (doc_id, h) w-token window hashes.  Distinct per
    (doc, h): the report only tests window EXISTENCE, and collapsing
    within-doc repeats before the write shrinks the index."""
    win = TX._window_table(docs, w, text_col, id_col).select(
        F.col(id_col).alias("doc_id"), "h"
    )
    return win.distinct()


def prep_index_build(
    docs: DataFrame,
    index_path: str,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One raw-corpus scan -> two skinny index tables under ``index_path``.

    ``doc_stats``: (doc_id, kept, fp).  ``win_hashes``: distinct
    (doc_id, h) w-token window hashes.  Both evaluate the text
    expressions in a single projection per table; at 100 TB each write
    is an embarrassingly parallel map (no shuffle for doc_stats; one
    map-side-combined distinct for win_hashes)."""
    _doc_stats_frame(docs, text_col, id_col).write.mode("overwrite").parquet(
        f"{index_path}/doc_stats"
    )
    _win_hash_frame(docs, w, text_col, id_col).write.mode("overwrite").parquet(
        f"{index_path}/win_hashes"
    )


def prep_index_append(
    new_docs: DataFrame,
    index_path: str,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Incremental index maintenance (the dd10 pattern applied to the
    prep index): scan ONLY the newly-ingested documents and append their
    doc-stats and window-hash rows as new parquet files.  The nightly
    100-TB job touches the day's delta, never the historical corpus;
    ``prep_funnel_report`` reads the union transparently.  Caller
    contract: ``new_docs`` ids are disjoint from already-indexed ids
    (the ingest watermark guarantees this upstream — same contract as
    ``dedup.minhash_incremental_dedup``'s new-batch input)."""
    _doc_stats_frame(new_docs, text_col, id_col).write.mode("append").parquet(
        f"{index_path}/doc_stats"
    )
    _win_hash_frame(new_docs, w, text_col, id_col).write.mode("append").parquet(
        f"{index_path}/win_hashes"
    )


def apply_prep_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One streaming micro-batch of new documents -> batch_id-keyed
    index partitions.  OVERWRITE of the batch's own directories makes
    at-least-once foreachBatch replays exactly-once (the covariance-
    state pattern: re-running batch k rewrites the same files)."""
    _doc_stats_frame(batch_df, text_col, id_col).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/doc_stats/batch={batch_id}")
    _win_hash_frame(batch_df, w, text_col, id_col).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/win_hashes/batch={batch_id}")


def prep_index_compact(spark: SparkSession, index_path: str) -> None:
    """Nightly compaction of a stream-maintained prep index: folds the
    per-micro-batch ``batch=N`` directories of both tables into one
    ``batch=-1`` via ``sinks.compact_batch_dirs``'s crash-safe swap.
    The funnel report is invariant at every crash point — it reads each
    table's parent dir and ignores the batch column, and each table's
    content multiset is unchanged, so a doc_stats-swapped/win_hashes-
    pending mix reports identically.  No-op on a flat batch-built index
    (``prep_index_build`` writes no batch directories)."""
    from martech_pipelines_spark.operators.sinks import compact_batch_dirs

    compact_batch_dirs(spark, f"{index_path}/doc_stats", batch_col="batch")
    compact_batch_dirs(spark, f"{index_path}/win_hashes", batch_col="batch")


def prep_funnel_report(
    spark: SparkSession, index_path: str, eval_mod: int = 3,
    as_of: int | None = None,
) -> DataFrame:
    """The 5-row per-stage survivor report from the index alone.

    Stage semantics identical to pipe10: raw -> quality_lang (kept) ->
    exact_dedup (lowest-id per fingerprint) -> train_split
    (doc_id % 10 != eval_mod) -> decontaminated (train docs with no
    8-gram window in the eval set's distinct window-hash union).

    ``as_of=N`` time-travels the report to the index as it stood after
    ingest batch N (sinks.read_batched_index) — the reproducible-
    training-run view: a run that recorded its batch id can replay the
    exact funnel/dedup decisions it trained against, until compaction
    folds past that horizon (then this raises rather than silently
    answering with the folded state).

    Probe shuffle shape: one window over the fingerprint table (32-byte
    keys), one broadcast of the distinct eval-hash set, one semi-join
    over ``win_hashes`` restricted to train survivors.  Raw text is
    never read."""
    from martech_pipelines_spark.operators.sinks import read_batched_index

    stats = read_batched_index(
        spark, f"{index_path}/doc_stats", batch_col="batch", as_of=as_of
    )
    win = read_batched_index(
        spark, f"{index_path}/win_hashes", batch_col="batch", as_of=as_of
    )

    kept = stats.where("kept")
    rn = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        kept.withColumn("__rn", F.row_number().over(rn))
        .where(F.col("__rn") == 1)
        .select("doc_id")
    )
    train = deduped.where(F.col("doc_id") % 10 != eval_mod)
    eval_h = (
        win.where(F.col("doc_id") % 10 == eval_mod).select("h").distinct()
    )
    contaminated = (
        win.join(train, "doc_id", "left_semi")
        .join(F.broadcast(eval_h), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").alias("docs"),
        )

    # train - contaminated as a crossJoin of two 1-row aggregates (the
    # corpus-wide "scalar broadcast" idiom — keeps the report fully lazy)
    decon = (
        train.agg(F.count("*").alias("__t"))
        .crossJoin(contaminated.agg(F.count("*").alias("__c")))
        .select(
            F.lit(4).alias("stage_idx"),
            F.lit("decontaminated").alias("stage"),
            (F.col("__t") - F.col("__c")).alias("docs"),
        )
    )
    return (
        stage(0, "raw", stats)
        .unionByName(stage(1, "quality_lang", kept))
        .unionByName(stage(2, "exact_dedup", deduped))
        .unionByName(stage(3, "train_split", train))
        .unionByName(decon)
    )


# --- mergeable dataset-card state (pipe11's incremental form) ----------------


def dataset_card_state(docs: DataFrame) -> DataFrame:
    """Reduce a document batch to MERGEABLE dataset-card state: one row
    per (source, lang, fp, n_chars) carrying the doc count and token
    sum.  Every pipe11 card metric is a fold over this table —
    counts/sums directly, language and exact-dup distincts as
    state-row counts, exact percentiles from the embedded n_chars
    histogram — and two states merge by summing counts, so nightly doc
    deltas fold in without rescanning history.  State size is bounded
    by |distinct docs| (the fp column IS the exact-dedup index, the
    honest floor for any card that reports a dup rate)."""
    return (
        docs.select(
            "source",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            TX.token_count(F.col("text")).cast("long").alias("__tk"),
            TX.fingerprint(F.col("text")).alias("fp"),
        )
        .groupBy("source", "lang", "fp", "n_chars")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__tk").cast("long").alias("toks"),
        )
    )


def fold_card_state(states: DataFrame) -> DataFrame:
    """Collapse ANY union of card states in one keyed pass (sum the
    count/token cells per key) — the single definition of the state key
    and merge rule, shared by the 2-way batch fold and the N-way
    streaming read."""
    return states.groupBy("source", "lang", "fp", "n_chars").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("toks").cast("long").alias("toks"),
    )


def merge_card_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two card states — the 2-way form of ``fold_card_state``."""
    return fold_card_state(a.unionByName(b))


def exact_length_percentiles(
    hist: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Exact per-group p50/p90 from a (group, y, cnt) value histogram by
    the r29 rank-selection rule min{y : cum(y) >= ceil(q*n)} — the ONE
    definition both dataset-card forms (pipe11 direct, pipe12/stream
    state-rendered) read their percentiles through."""
    wc = (
        Window.partitionBy(group_col)
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(group_col)
    cum = hist.select(
        group_col,
        "y",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wn).alias("n"),
    )
    return cum.groupBy(group_col).agg(
        F.min(
            F.when(F.col("c") >= F.ceil(F.col("n") * F.lit(0.50)), F.col("y"))
        ).cast("long").alias("p50_chars"),
        F.min(
            F.when(F.col("c") >= F.ceil(F.col("n") * F.lit(0.90)), F.col("y"))
        ).cast("long").alias("p90_chars"),
    )


def render_dataset_card(state: DataFrame) -> DataFrame:
    """The pipe11 per-source card read off the state table: one agg for
    counts/distincts/sums, the r29 histogram rule for exact p50/p90
    lengths, joined on |sources| rows."""
    agg = state.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        (F.sum("n") - F.count_distinct("fp")).cast("long").alias("dup_docs"),
        F.sum(F.col("n") * F.col("n_chars")).cast("long").alias("total_chars"),
        F.sum("toks").cast("long").alias("total_tokens"),
    )
    hist = state.groupBy("source", F.col("n_chars").alias("y")).agg(
        F.sum("n").alias("cnt")
    )
    return agg.join(exact_length_percentiles(hist), "source")
