"""Mergeable-sketch operators: incremental distinct counts via HLL.

``r3b`` covers one-shot approximate distinct; this module covers the
100-TB shape that actually matters: distinct counts over DATA THAT KEEPS
ARRIVING. Recomputing exact distinct per run re-scans the full history;
an HLL sketch per key is a small mergeable state — union the new batch's
sketches into the stored ones and estimate, never touching history
again (the same IVM asymmetry as ``cdc.incremental_agg_update``, for a
non-distributive aggregate).

Determinism note: Spark's datasketches HLL is a deterministic function
of the input multiset (fixed lgK, no RNG), so union-of-batch-sketches
equals the full-corpus sketch BIT-FOR-BIT — pinned in tests. The
estimate differs from exact count (that is the trade), so the corpus
query is rows-only with error/mergeability gates in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch_table(
    df: DataFrame, key_cols: str | list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of ``col``: (keys..., sketch binary). The
    sketch column is the MERGEABLE state a distinct-count view stores
    instead of the raw history."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch")
    )


def merge_sketch_tables(
    base: DataFrame, delta: DataFrame, key_cols: str | list[str]
) -> DataFrame:
    """Fold a new batch's sketch table into the stored one: union + one
    keyed ``hll_union_agg``. Only the delta was freshly aggregated; the
    base rows are opaque state."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def estimate_distinct(sketches: DataFrame, out_col: str = "approx_distinct") -> DataFrame:
    """Read side: sketch -> estimate (bigint)."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate("sketch").cast("long")
    ).drop("sketch")
