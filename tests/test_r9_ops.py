"""Round-9 operator tests: deterministic Lloyd's k-means and the
production graph-ANN registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from martech_pipelines_spark.operators import similarity as SIM
from martech_pipelines_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lloyd_zero_iters_equals_s2e_assignment(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = SIM.modular_representatives(emb, nlist=8)
    want = sorted(
        map(
            tuple,
            SIM.quantized_cell_assignments(emb, cents)
            .select("vec_id", "cell", "d2q")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            SIM.kmeans_lloyd_det(emb, nlist=8, iters=0)
            .select("vec_id", "cell", "d2q")
            .collect(),
        )
    )
    assert got == want


def test_lloyd_separates_two_obvious_clusters(spark):
    # two tight groups on opposite axes; one update round must pull the
    # centroids to the group means and assign each point to its group
    rows = [
        (0, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (4, [0.95, 0.02]),
        (1, [0.0, 1.0]),
        (3, [0.1, 0.9]),
        (5, [0.02, 0.95]),
    ]
    emb = _emb_df(spark, rows)
    out = SIM.kmeans_lloyd_det(emb, nlist=2, iters=2).collect()
    by_cell: dict = {}
    for r in out:
        by_cell.setdefault(r["cell"], set()).add(r["vec_id"])
    assert sorted(by_cell.values(), key=min) == [{0, 2, 4}, {1, 3, 5}]


def test_lloyd_objective_nonincreasing(spark):
    # Lloyd's invariant: total within-cluster squared distance never
    # increases with more iterations (exact integers, so comparable)
    emb = load_table(spark, SF, "embeddings")
    costs = [
        SIM.kmeans_lloyd_det(emb, nlist=16, iters=i)
        .agg(F.sum("d2q"))
        .collect()[0][0]
        for i in range(4)
    ]
    assert all(a >= b for a, b in zip(costs, costs[1:])), costs


def test_lloyd_every_vector_assigned_exactly_once(spark):
    emb = load_table(spark, SF, "embeddings")
    out = SIM.kmeans_lloyd_det(emb, nlist=16, iters=2)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


def test_s29b_beam_results_subset_of_scored_corpus(spark):
    # every returned neighbor must be a node the beam could have reached:
    # rank 1..k per query, scores are valid rounded cosines
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    graph = SIM.knn_graph_lsh(emb, dim=64, k=8, bits=32, bands=4).select(
        "src_id", "nbr_id"
    )
    entry = emb.agg(F.min("vec_id")).collect()[0][0]
    out = SIM.graph_ann_beam_search(
        queries, emb, graph, entry_id=entry, hops=3, beam=4, k=5
    ).collect()
    assert len(out) > 0
    per_q: dict = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
        assert -1.0001 <= r["cos_sim"] <= 1.0001
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_beam_sweep_matches_independent_runs(spark):
    # sweep_hops snapshots from ONE walk must equal running the search
    # independently at each hop count
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    graph = SIM.knn_graph_lsh(emb, dim=64, k=8, bits=32, bands=4).select(
        "src_id", "nbr_id"
    )
    entry = emb.agg(F.min("vec_id")).collect()[0][0]
    sweep = SIM.graph_ann_beam_search(
        queries, emb, graph, entry_id=entry, hops=3, beam=4, k=5,
        sweep_hops=[1, 2, 3],
    ).collect()
    by_h: dict = {}
    for r in sweep:
        by_h.setdefault(r["hops"], set()).add(
            (r["query_id"], r["vec_id"], r["cos_sim"], r["rnk"])
        )
    for h in (1, 2, 3):
        solo = {
            (r["query_id"], r["vec_id"], r["cos_sim"], r["rnk"])
            for r in SIM.graph_ann_beam_search(
                queries, emb, graph, entry_id=entry, hops=h, beam=4, k=5
            ).collect()
        }
        assert by_h[h] == solo and len(solo) > 0


def test_kmv_merge_equals_sketch_of_union(spark):
    # KMV mergeability: k smallest of A∪B == merge of per-batch sketches
    from martech_pipelines_spark.operators import sketches as SK

    ev = load_table(spark, SF, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = {
        tuple(r)
        for r in SK.kmv_sketch_table(ev, "event_type", "user_id", k=32).collect()
    }
    merged = {
        tuple(r)
        for r in SK.kmv_merge(
            SK.kmv_sketch_table(a, "event_type", "user_id", k=32),
            SK.kmv_sketch_table(b, "event_type", "user_id", k=32),
            "event_type",
            k=32,
        ).collect()
    }
    assert whole == merged and len(whole) > 0


def test_kmv_estimate_exact_below_k(spark):
    # below k distinct values the sketch IS the distinct set: estimate
    # must equal the exact distinct count
    from martech_pipelines_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, "a"), (3, "b")], "user_id long, g string"
    )
    sk = SK.kmv_sketch_table(df, "g", "user_id", k=64)
    got = {
        r["g"]: r["kmv_est"]
        for r in SK.kmv_estimate(sk, "g", k=64).collect()
    }
    assert got == {"a": 2, "b": 1}


def test_kmv_estimate_error_bounded_at_k64(spark):
    # standard KMV relative error ~ 1/sqrt(k-2) (~12.7% at k=64);
    # gate at 3 sigma on the real table
    from martech_pipelines_spark.operators import sketches as SK

    ev = load_table(spark, SF, "events")
    sk = SK.kmv_sketch_table(ev, "event_type", "user_id", k=64)
    est = {
        r["event_type"]: r["kmv_est"]
        for r in SK.kmv_estimate(sk, "event_type", k=64).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(3, 0.38 * n), (t, est[t], n)


def test_cc_label_min_converges_to_true_components(spark):
    # fixed-round min-label must, at convergence (rounds >= diameter),
    # carry each component's true min id — checked against a driver-side
    # union-find over the same (small) edge set
    from martech_pipelines_spark.operators import graph as G

    li = load_table(spark, SF, "lineitem")
    edges = G.copurchase_edges(li)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    # converge: double rounds until labels stop changing
    rounds = 4
    prev = None
    while True:
        got = {
            r["node"]: r["lbl"]
            for r in G.cc_label_min_rounds(edges, rounds=rounds).collect()
        }
        if got == prev:
            break
        prev, rounds = got, rounds * 2
        assert rounds <= 64, "did not converge"
    assert got == want and len(got) > 0


def test_rfm_scores_partition_into_quintiles(spark):
    # every score in 1..5; per dimension, bucket sizes differ by at most
    # ceil/floor of n/5 (the exact-rank quintile contract)
    from martech_pipelines_spark.plans.corpus_r9 import mart22_rfm_scores

    out = mart22_rfm_scores(spark, SF).collect()
    n = len(out)
    assert n > 0
    for dim in ("r_score", "f_score", "m_score"):
        sizes: dict = {}
        for r in out:
            assert 1 <= r[dim] <= 5, (dim, r[dim])
            sizes[r[dim]] = sizes.get(r[dim], 0) + 1
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1 + (n % 5 != 0)
