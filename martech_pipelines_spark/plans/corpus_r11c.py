"""Round-11 corpus, wave 3: index-deletion maintenance and multi-seed
graph closeness — both with full DuckDB oracles.

- ``h36_postings_delete_ivm`` — the DELETE side of incremental index
  maintenance (h31 proved inserts; production also needs takedowns/
  GDPR erasure): dropping a doc from the t54 inverted index is one
  keyed anti-join on the doc-partitioned cell state — history is never
  re-tokenized — and the readout must equal a full recompute over the
  surviving corpus.  df pruning and norms being readout-time (the h31
  design decision) is exactly what makes deletion this cheap: a df that
  falls back under the cap after deletions re-qualifies automatically.
- ``g9_harmonic_closeness`` — multi-seed labeled BFS (the g8 kernel
  carrying a seed column) folded into per-seed harmonic centrality
  (Boldi & Vigna 2014's recommendation over closeness for disconnected
  graphs) over a fixed 3-hop horizon, in exact half-up e6 arithmetic.

Reference anchor: SURVEY.md §2.J north-star graph/retrieval lanes; no
analog in the reference's compute layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from martech_pipelines_spark.plans.corpus import q
from martech_pipelines_spark.plans.corpus_r10 import (
    _t54_ctes,
    sparse_topk_readout,
    trigram_tf_state,
)
from martech_pipelines_spark.sources import load_table

# =============================================================================
# h36: postings-index deletion maintenance
# =============================================================================

_H36_KEEP = "doc_id % 7 <> 0"  # deterministic takedown set: every 7th doc

_T54_CTES_DELETED = _t54_ctes().replace(
    "FROM documents",
    "FROM (SELECT * FROM documents WHERE doc_id % 7 <> 0)",
)
assert _t54_ctes().count("FROM documents") == 1

_H36_ORACLE = f"""
WITH {_T54_CTES_DELETED}
SELECT doc_id, nbr_id, dot, cos2_e6, rn FROM sp5
"""


@q("h36_postings_delete_ivm", _H36_ORACLE)
def h36_postings_delete_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t54's DELETION maintenance proof (the other half of h31's insert
    IVM — takedown/erasure requests at 100 TB must not re-tokenize the
    corpus): build the full inverted-index state once, then erase every
    7th doc with ONE keyed anti-join on the cell state and run the
    unchanged readout — the result must hash-equal a ground-up
    recompute over the surviving documents (the oracle).  Works because
    the state is doc-partitioned (a doc's cells form its erasure unit)
    and df pruning/norms are readout-time, so term statistics heal
    automatically as docs disappear."""
    docs = load_table(spark, sf_dir, "documents")
    state = trigram_tf_state(docs)
    deleted = docs.where(~F.expr(_H36_KEEP)).select("doc_id")
    maintained = state.join(F.broadcast(deleted), "doc_id", "left_anti")
    return sparse_topk_readout(maintained)


# =============================================================================
# g9: multi-seed harmonic closeness over a fixed hop horizon
# =============================================================================

_G9_ROUNDS = 3
_G9_SEEDS = 3  # fixed-size seed panel: the top-3 degree nodes — |seeds|
               # constant at every sf (the s8c3 fixed-|Q| lesson), so the
               # labeled-BFS cost is a bounded multiple of one BFS


def _g9_oracle() -> str:
    blocks = [
        f"""li AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p
    ), seeds AS (
        SELECT src AS seed FROM (
            SELECT src, count(*) AS deg FROM edges GROUP BY 1
            ORDER BY deg DESC, src ASC LIMIT {_G9_SEEDS}
        )
    ), d0 AS (
        SELECT seed, seed AS node, CAST(0 AS BIGINT) AS hops FROM seeds
    )"""
    ]
    for i in range(_G9_ROUNDS):
        blocks.append(
            f"""d{i + 1} AS (
        SELECT seed, node, CAST(min(hops) AS BIGINT) AS hops FROM (
            SELECT seed, node, hops FROM d{i}
            UNION ALL
            SELECT d.seed, e.dst AS node, d.hops + 1 AS hops
            FROM d{i} d JOIN edges e ON e.src = d.node
        ) GROUP BY 1, 2
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"""
    SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum((2000000 + hops) // (2 * hops)) AS BIGINT) AS harm_e6
    FROM d{_G9_ROUNDS} WHERE hops > 0
    GROUP BY 1
"""
    )


def multi_seed_bfs(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """Labeled multi-source BFS: per (seed, node) exact hop distance
    within ``rounds`` sync frontier expansions — the g8 kernel with a
    seed column riding along, so every seed's BFS shares the SAME keyed
    joins (one pass over the edge list per round serves all seeds).
    State is |seeds| x |reached| rows — seed-set bounded, never
    all-pairs."""
    dist = seeds.select(
        F.col("seed"), F.col("seed").alias("node"),
        F.lit(0).cast("long").alias("hops"),
    )
    for _ in range(rounds):
        reached = edges.join(dist, edges["src"] == dist["node"]).select(
            "seed", F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops")
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("seed", "node")
            .agg(F.min("hops").cast("long").alias("hops"))
        )
    return dist


@q("g9_harmonic_closeness", _g9_oracle())
def g9_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness of a fixed top-degree seed panel (the 3
    highest-degree part nodes, ties to the lowest id) over the
    co-purchase graph, 3-hop horizon: sum of half-up-e6 reciprocal hop
    distances to every reached node — the centrality that stays
    meaningful on disconnected graphs (unreached nodes contribute 0
    instead of poisoning a mean).  Scale shape: one labeled BFS (per
    round one keyed join over the edge list + a map-side-combined min
    serving ALL seeds), then a seed-keyed fold; the panel size is a
    CONSTANT, so total work is a bounded multiple of one g8 BFS at
    every sf (a %-of-nodes panel would multiply the edge scan with the
    catalog — the s8c3 fixed-|Q| lesson applied to graphs)."""
    from martech_pipelines_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    seeds = (
        edges.groupBy("src")
        .agg(F.count("*").alias("__deg"))
        .orderBy(F.desc("__deg"), F.asc("src"))
        .limit(_G9_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    dist = multi_seed_bfs(edges, seeds, rounds=_G9_ROUNDS)
    return (
        dist.where(F.col("hops") > 0)
        .groupBy("seed")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(
                F.expr("(2000000 + hops) div (2 * hops)")
            ).cast("long").alias("harm_e6"),
        )
    )
