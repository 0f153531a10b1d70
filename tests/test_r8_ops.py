"""Round-8 operator tests: MMR diversification re-rank + containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.operators import dedup as DD
from martech_pipelines_spark.operators import similarity as SIM


# --- mmr_rerank --------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    # corpus: a = most relevant, b = near-copy of a, c = diverse but
    # still relevant.  Plain top-3 by relevance is (a, b, c); MMR must
    # demote the near-copy: (a, c, b).  (The query is NOT exactly a —
    # if it were, rel(x) == sim(x, a) and every step-2 score would tie
    # at zero, collapsing MMR back to the relevance order.)
    corpus = _emb_df(
        spark,
        [
            (1, [1.0, 0.0]),      # a: rel 9.0e11
            (2, [0.98, 0.05]),    # b: rel 8.87e11 but sim(b,a) = 9.8e11
            (3, [0.60, 0.80]),    # c: rel 6.2e11, sim(c,a) = 6.0e11
        ],
    )
    queries = _emb_df(spark, [(100, [0.9, 0.1])]).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.mmr_rerank(queries, corpus, n_candidates=3, k=3)
    picks = [
        r["vec_id"]
        for r in out.orderBy("mmr_rank").collect()
    ]
    # plain IP-relevance order is (1, 2, 3) by construction
    # (9.0e11 > 8.87e11 > 6.2e11) — MMR demotes the near-copy
    assert picks == [1, 3, 2]


def test_mmr_emits_min_k_n_and_total_tiebreak(spark):
    # two identical candidates: tie on every score -> lowest vec_id first;
    # k larger than the candidate count -> emits exactly n rows
    corpus = _emb_df(spark, [(7, [1.0, 0.0]), (4, [1.0, 0.0])])
    queries = _emb_df(spark, [(0, [1.0, 0.0])]).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.mmr_rerank(queries, corpus, n_candidates=5, k=5).collect()
    assert len(out) == 2
    ranked = sorted(out, key=lambda r: r["mmr_rank"])
    assert [r["vec_id"] for r in ranked] == [4, 7]


def test_mmr_first_pick_score_is_relevance(spark):
    corpus = _emb_df(spark, [(1, [0.5, 0.5]), (2, [0.1, 0.1])])
    queries = _emb_df(spark, [(0, [1.0, 0.0])]).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = {r["mmr_rank"]: r for r in SIM.mmr_rerank(
        queries, corpus, n_candidates=2, k=2).collect()}
    # rel(q, v1) = 1e6 * 5e5 = 5e11 exactly (quantized integer IP)
    assert rows[1]["vec_id"] == 1 and rows[1]["mmr_score"] == 500000000000


# --- containment_on_pairs ----------------------------------------------------


def test_containment_detects_doc_in_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta"),  # strict prefix of 1
            (3, "iota kappa lam mu nu xi"),  # disjoint
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(2, 1), (3, 1)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in DD.containment_on_pairs(pairs, docs, shingle_n=3).collect()
    }
    # doc2: 2 shingles, both inside doc1's 6 -> containment exactly 1.0,
    # jaccard 2/6 -> 3333 (half-up e4)
    assert out[(2, 1)]["containment_e4"] == 10000
    assert out[(2, 1)]["jaccard_e4"] == 3333
    # disjoint pair: both metrics zero
    assert out[(3, 1)]["containment_e4"] == 0
    assert out[(3, 1)]["jaccard_e4"] == 0


def test_containment_empty_shingle_side_is_zero_not_null(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )  # doc1: 2 tokens -> 0 shingles at n=3
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    row = DD.containment_on_pairs(pairs, docs, shingle_n=3).collect()[0]
    assert row["containment_e4"] == 0 and row["jaccard_e4"] == 0


def test_mmr_accepts_external_candidate_table(spark):
    # composability: a precomputed (query_id, vec_id, rel) candidate
    # table (IVF/Arrow generators at scale) must produce the same
    # selection as the built-in brute-force stage
    corpus = _emb_df(
        spark,
        [(1, [1.0, 0.0]), (2, [0.98, 0.05]), (3, [0.60, 0.80]),
         (4, [0.10, 0.99])],
    )
    queries = _emb_df(spark, [(100, [0.9, 0.1])]).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    default = sorted(
        map(tuple, SIM.mmr_rerank(queries, corpus, n_candidates=4, k=3).collect())
    )
    cand = (
        queries.alias("q")
        .crossJoin(corpus.alias("c"))
        .select(
            F.col("q.query_id"),
            F.col("c.vec_id"),
            SIM.dot(
                SIM.quantized_vec(F.col("q.embedding")),
                SIM.quantized_vec(F.col("c.embedding")),
            ).cast("long").alias("rel"),
        )
    )
    external = sorted(
        map(
            tuple,
            SIM.mmr_rerank(
                queries, corpus, n_candidates=4, k=3, candidates=cand
            ).collect(),
        )
    )
    assert external == default and len(default) == 3


def test_mart10_plan_has_no_self_join(spark):
    # the round-8 rework: baskets collected once, pairs generated
    # map-side — the plan must carry no join of the fact table against
    # itself (only the broadcast joins of the tiny count dims remain)
    from martech_pipelines_spark.plans import QUERIES

    plan = (
        QUERIES["mart10_basket_affinity"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    # was 8 exchanges in the self-join form; the basket form carries 7
    # in the 8-partition test session (6 under bench settings)
    assert plan.count("Exchange hashpartitioning") <= 7, plan


# --- as-of (time-travel) reads over incremental indexes ----------------------


def test_ivf_as_of_probe_replays_history(spark, tmp_path):
    import pytest as _pytest

    from martech_pipelines_spark.operators import similarity as SIM
    from martech_pipelines_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.where(F.col("vec_id") % 3 == 0)
    b0 = emb.where(F.col("vec_id") % 3 == 1)
    b1 = emb.where(F.col("vec_id") % 3 == 2)
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    idx = str(tmp_path / "asof_idx")
    SIM.ivf_det_build_index(base, idx, nlist=16)
    SIM.ivf_det_append_batch(b0, 0, idx)
    SIM.ivf_det_append_batch(b1, 1, idx)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    full = rows(SIM.ivf_det_probe_topk(queries, idx, k=5, nprobe=4))
    # as-of the newest batch == the live read
    assert rows(SIM.ivf_det_probe_topk(queries, idx, k=5, nprobe=4, as_of=1)) == full

    # as-of batch 0 == an index that never saw batch 1
    idx0 = str(tmp_path / "asof_idx0")
    SIM.ivf_det_build_index(base, idx0, nlist=16)
    SIM.ivf_det_append_batch(b0, 0, idx0)
    want0 = rows(SIM.ivf_det_probe_topk(queries, idx0, k=5, nprobe=4))
    got0 = rows(SIM.ivf_det_probe_topk(queries, idx, k=5, nprobe=4, as_of=0))
    assert got0 == want0 and got0 != full

    # compaction folds the deltas: history below the horizon now raises
    SIM.ivf_compact_index(spark, idx)
    assert rows(SIM.ivf_det_probe_topk(queries, idx, k=5, nprobe=4)) == full
    with _pytest.raises(ValueError, match="compaction horizon"):
        SIM.ivf_det_probe_topk(queries, idx, k=5, nprobe=4, as_of=0)
    # as-of at/above the horizon is still answerable (== the folded base)
    assert rows(SIM.ivf_det_probe_topk(queries, idx, k=5, nprobe=4, as_of=1)) == full


def test_prep_report_as_of_replays_history(spark, tmp_path):
    import pytest as _pytest

    from martech_pipelines_spark.operators import prep
    from martech_pipelines_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    b0 = docs.where(F.col("doc_id") % 2 == 0)
    b1 = docs.where(F.col("doc_id") % 2 == 1)

    idx = str(tmp_path / "prep_asof")
    prep.apply_prep_index_batch(b0, 0, idx)
    prep.apply_prep_index_batch(b1, 1, idx)

    idx0 = str(tmp_path / "prep_asof0")
    prep.apply_prep_index_batch(b0, 0, idx0)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    full = rows(prep.prep_funnel_report(spark, idx))
    assert rows(prep.prep_funnel_report(spark, idx, as_of=1)) == full
    got0 = rows(prep.prep_funnel_report(spark, idx, as_of=0))
    assert got0 == rows(prep.prep_funnel_report(spark, idx0)) and got0 != full

    prep.prep_index_compact(spark, idx)
    assert rows(prep.prep_funnel_report(spark, idx)) == full
    with _pytest.raises(ValueError, match="compaction horizon"):
        prep.prep_funnel_report(spark, idx, as_of=0).collect()


def test_trained_ivf_as_of_passthrough(spark, tmp_path):
    # the trained probe shares _read_ivf_corpus: as_of=0 must equal an
    # index that never saw batch 1 (same pin as the deterministic twin)
    from martech_pipelines_spark.operators import similarity as SIM
    from martech_pipelines_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.where(F.col("vec_id") % 3 == 0)
    b0 = emb.where(F.col("vec_id") % 3 == 1)
    b1 = emb.where(F.col("vec_id") % 3 == 2)
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    idx = str(tmp_path / "tivf")
    SIM.ivf_build_index(base, idx, nlist=8)
    SIM.ivf_index_append_batch(b0, 0, idx)
    SIM.ivf_index_append_batch(b1, 1, idx)

    idx0 = str(tmp_path / "tivf0")
    SIM.ivf_build_index(base, idx0, nlist=8)  # same seed -> same quantizer
    SIM.ivf_index_append_batch(b0, 0, idx0)

    got0 = rows(SIM.ivf_probe_topk(queries, idx, k=5, nprobe=4, as_of=0))
    want0 = rows(SIM.ivf_probe_topk(queries, idx0, k=5, nprobe=4))
    full = rows(SIM.ivf_probe_topk(queries, idx, k=5, nprobe=4))
    assert got0 == want0 and got0 != full


def test_read_batched_index_flat_layout_tolerates_as_of(spark, tmp_path):
    # a flat batch-built index has no batch partition column: as_of is a
    # no-op read of the initial snapshot, never a crash
    from martech_pipelines_spark.operators import prep
    from martech_pipelines_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = str(tmp_path / "flat_prep")
    prep.prep_index_build(docs, idx)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(prep.prep_funnel_report(spark, idx, as_of=5)) == rows(
        prep.prep_funnel_report(spark, idx)
    )


def test_mmr_singleton_candidate_emits_rank1(spark):
    # ADVICE r8: a query whose candidate set has exactly ONE member used
    # to vanish (the a!=b pair join yields no rows, so its group never
    # formed).  It must return the sole candidate at mmr_rank 1 with
    # score = rel, alongside an unaffected multi-candidate query.
    corpus = _emb_df(
        spark,
        [(1, [1.0, 0.0]), (2, [0.98, 0.05]), (3, [0.60, 0.80])],
    )
    queries = _emb_df(
        spark, [(100, [0.9, 0.1]), (200, [0.1, 0.9])]
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    rel = SIM.dot(
        SIM.quantized_vec(F.col("q.embedding")),
        SIM.quantized_vec(F.col("c.embedding")),
    ).cast("long")
    cand = (
        queries.alias("q")
        .crossJoin(corpus.alias("c"))
        .select(F.col("q.query_id"), F.col("c.vec_id"), rel.alias("rel"))
        # query 200 keeps ONE candidate; query 100 keeps all three
        .where((F.col("query_id") == 100) | (F.col("vec_id") == 3))
    )
    got = {
        r["query_id"]: r
        for r in SIM.mmr_rerank(
            queries, corpus, n_candidates=3, k=2, candidates=cand
        ).collect()
        if r["mmr_rank"] == 1
    }
    assert set(got) == {100, 200}
    # first pick's score is the raw relevance: quantized dot of
    # [0.1, 0.9] and [0.60, 0.80] at 1e6 scale
    want_rel = 100_000 * 600_000 + 900_000 * 800_000
    assert got[200]["vec_id"] == 3 and got[200]["mmr_score"] == want_rel
    only_200 = [
        r
        for r in SIM.mmr_rerank(
            queries, corpus, n_candidates=3, k=2, candidates=cand
        ).collect()
        if r["query_id"] == 200
    ]
    assert len(only_200) == 1 and only_200[0]["mmr_rank"] == 1
