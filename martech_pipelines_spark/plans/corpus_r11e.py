"""Round-11 corpus, wave 5: the mutual-kNN readout proved maintainable.

``h38_incremental_mutual_knn`` — s36's IVM twin (SHARES its oracle):
the mutual-top-k edge list re-derives exactly from incrementally
maintained inverted-index state, because BOTH stages downstream of the
state (the per-doc top-k rank and the reciprocity join) are
readout-time.  Together with h31 (insert) and h36 (delete) this closes
the maintenance triangle for the sparse-retrieval family: ingest a
batch, erase a takedown set, re-rank and re-verify pairs on demand —
never re-tokenizing history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import ORACLE, q
from martech_pipelines_spark.plans.corpus_r10 import (
    sparse_topk_readout,
    trigram_tf_state,
)
from martech_pipelines_spark.sources import load_table


def mutual_pairs_readout(tf_state: DataFrame) -> DataFrame:
    """s36's reciprocity join over any (merged) inverted-index state."""
    topk = sparse_topk_readout(tf_state).select(
        "doc_id", "nbr_id", "dot", "cos2_e6"
    )
    rev = topk.select(
        F.col("doc_id").alias("nbr_id"), F.col("nbr_id").alias("doc_id")
    )
    return (
        topk.join(rev, ["doc_id", "nbr_id"])
        .where(F.col("doc_id") < F.col("nbr_id"))
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("nbr_id").alias("doc_b"),
            "dot",
            "cos2_e6",
        )
    )


@q("h38_incremental_mutual_knn", ORACLE["s36_mutual_sparse_knn"])
def h38_incremental_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s36 maintained INCREMENTALLY (SHARES s36's oracle — the IVM
    proof): three doc-id-residue ingest batches each reduce to their
    own inverted-index cells, compose by union, and the unchanged
    top-k + reciprocity readout must hash-equal the full recompute.
    What this adds over h31: it proves a COMPOSED consumer (rank THEN
    symmetric join) of maintained state stays exact, not just the
    first-order rank — the pattern a production near-dup verifier
    (ingest -> candidate -> mutual check) runs every batch."""
    docs = load_table(spark, sf_dir, "documents")
    state = None
    for r in range(3):
        part = trigram_tf_state(docs.where(F.col("doc_id") % 3 == r))
        state = part if state is None else state.unionByName(part)
    return mutual_pairs_readout(state)
