"""Batched-index compaction: every streamed/appended index family folds
its ``batch_id=N`` (or ``batch=N``) micro-batch directories into one
``-1`` directory through ``sinks.compact_batch_dirs``'s crash-safe swap
protocol, with probe answers invariant — and every reader self-heals an
interrupted compaction via ``sinks.recover_dir_swap``.

(The IVF corpus_delta compaction, which additionally merges into a
separate base layout, is pinned in tests/test_plans.py.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from martech_pipelines_spark.operators import dedup, prep, text
from martech_pipelines_spark.operators.sinks import (
    compact_batch_dirs,
    recover_dir_swap,
)
from martech_pipelines_spark.sources import load_table
from martech_pipelines_spark.streaming.stream import _ingest_postings_batch

SF = "/root/testdata/sf0.001"


def _batch_dirs(root: str, prefix: str = "batch_id=") -> list[str]:
    return sorted(d for d in os.listdir(root) if d.startswith(prefix))


def test_bm25_compaction_preserves_query(spark, tmp_path):
    """Build on half the corpus, stream-ingest the rest as two batches,
    compact: the top-k answer is bit-identical, postings fold to one
    term-partitioned batch_id=-1, stats fold to one one-row batch."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm25_idx")
    text.bm25_build_index(docs.where(F.col("doc_id") % 3 == 0), idx)
    _ingest_postings_batch(docs.where(F.col("doc_id") % 3 == 1), 0, idx)
    _ingest_postings_batch(docs.where(F.col("doc_id") % 3 == 2), 1, idx)
    terms = ("dup", "fast", "scan")  # t19's corpus-present term set
    want = sorted(
        map(tuple, text.bm25_query_index(spark, idx, terms, k=10).collect())
    )
    assert want  # the query must actually hit postings
    assert len(_batch_dirs(f"{idx}/postings")) == 3

    text.bm25_compact_index(spark, idx)
    assert _batch_dirs(f"{idx}/postings") == ["batch_id=-1"]
    assert _batch_dirs(f"{idx}/stats") == ["batch_id=-1"]
    # term stays the inner partition key -> IN-list pruning unchanged
    assert any(
        d.startswith("term=")
        for d in os.listdir(f"{idx}/postings/batch_id=-1")
    )
    got = sorted(
        map(tuple, text.bm25_query_index(spark, idx, terms, k=10).collect())
    )
    assert got == want
    # idempotent: a second compaction finds a single batch -> no-op
    assert compact_batch_dirs(spark, f"{idx}/postings") is False
    assert (
        sorted(
            map(
                tuple, text.bm25_query_index(spark, idx, terms, k=10).collect()
            )
        )
        == want
    )


def test_minhash_compaction_preserves_pairs(spark, tmp_path):
    """Signatures streamed as sibling batches fold to batch_id=-1 with
    the near-dup pair set unchanged."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "mh_idx")
    dedup.minhash_build_index(docs.where(F.col("doc_id") % 2 == 0), idx)
    # the streaming ingest's per-batch write, applied directly
    dedup.minhash_signature_table(
        docs.where(F.col("doc_id") % 2 == 1), "text", "doc_id", 16, 3
    ).write.mode("overwrite").parquet(f"{idx}/signatures/batch_id=0")
    want = sorted(
        map(
            tuple,
            dedup.minhash_index_near_duplicates(spark, idx).collect(),
        )
    )
    assert want  # planted near-dups must actually surface

    dedup.minhash_compact_index(spark, idx)
    assert _batch_dirs(f"{idx}/signatures") == ["batch_id=-1"]
    got = sorted(
        map(
            tuple,
            dedup.minhash_index_near_duplicates(spark, idx).collect(),
        )
    )
    assert got == want


def test_prep_compaction_preserves_report(spark, tmp_path):
    """A purely stream-built prep index (batch=N dirs) folds to
    batch=-1 with the funnel report unchanged; a flat batch-built index
    is a documented no-op."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = str(tmp_path / "prep_idx")
    prep.apply_prep_index_batch(docs.where(F.col("doc_id") % 2 == 0), 0, idx)
    prep.apply_prep_index_batch(docs.where(F.col("doc_id") % 2 == 1), 1, idx)
    want = sorted(
        map(tuple, prep.prep_funnel_report(spark, idx).collect())
    )

    prep.prep_index_compact(spark, idx)
    assert _batch_dirs(f"{idx}/doc_stats", "batch=") == ["batch=-1"]
    assert _batch_dirs(f"{idx}/win_hashes", "batch=") == ["batch=-1"]
    got = sorted(map(tuple, prep.prep_funnel_report(spark, idx).collect()))
    assert got == want

    flat = str(tmp_path / "prep_flat")
    prep.prep_index_build(docs, flat)
    flat_want = sorted(
        map(tuple, prep.prep_funnel_report(spark, flat).collect())
    )
    prep.prep_index_compact(spark, flat)  # no batch dirs -> no-op
    assert (
        sorted(map(tuple, prep.prep_funnel_report(spark, flat).collect()))
        == flat_want
    )


def test_recover_dir_swap_crash_states(spark, tmp_path):
    """The three recoverable states of the two-rename swap: stale
    .next dropped (source intact), missing live + .old restored, live +
    lingering .old cleaned — content identical in each case."""
    root = str(tmp_path / "t")
    spark.range(10).write.parquet(f"{root}/batch_id=-1")
    spark.range(10, 20).write.parquet(f"{root}/batch_id=0")
    want = set(range(20))

    def ids() -> set:
        return {
            r["id"] for r in spark.read.parquet(root).select("id").collect()
        }

    # died mid-write: stale partial .next must not shadow the source
    os.makedirs(root + ".next/batch_id=-1", exist_ok=True)
    recover_dir_swap(root)
    assert not os.path.isdir(root + ".next") and ids() == want

    # died between the two renames: no live dir, complete .old
    os.rename(root, root + ".old")
    recover_dir_swap(root)
    assert not os.path.isdir(root + ".old") and ids() == want

    # died after the swap, before cleanup: live dir + lingering .old
    assert compact_batch_dirs(spark, root) is True
    shutil.copytree(root, root + ".old")
    recover_dir_swap(root)
    assert not os.path.isdir(root + ".old") and ids() == want
    assert _batch_dirs(root) == ["batch_id=-1"]


def test_horizon_marker_written_before_swap(spark, tmp_path, monkeypatch):
    """ADVICE r8: the time-travel horizon marker must land BEFORE the
    destructive root swap.  A crash between marker and swap then errs
    conservative — recovery restores the deltas and an as-of read under
    the premature horizon is REFUSED — instead of the old ordering's
    silent wrong answer (compacted root, stale horizon)."""
    import pytest

    from martech_pipelines_spark.operators.sinks import read_batched_index

    root = str(tmp_path / "t")
    spark.range(10).write.parquet(f"{root}/batch_id=-1")
    spark.range(10, 20).write.parquet(f"{root}/batch_id=0")
    spark.range(20, 30).write.parquet(f"{root}/batch_id=1")
    want = set(range(30))

    real_rename = os.rename

    def boom(src, dst):  # crash at the FIRST swap rename
        raise OSError("simulated crash between marker write and swap")

    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(OSError, match="simulated crash"):
        compact_batch_dirs(spark, root)
    monkeypatch.setattr(os, "rename", real_rename)

    # marker landed before the crash; the deltas are intact
    assert os.path.exists(root + ".compacted_through")
    recover_dir_swap(root)
    assert {
        r["id"] for r in read_batched_index(spark, root).select("id").collect()
    } == want
    # conservative refusal: as-of under the premature horizon raises
    with pytest.raises(ValueError):
        read_batched_index(spark, root, as_of=0).collect()
    # and the next successful compaction cycle self-heals the surface
    assert compact_batch_dirs(spark, root) is True
    assert {
        r["id"] for r in read_batched_index(spark, root).select("id").collect()
    } == want
