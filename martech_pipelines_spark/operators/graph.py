"""Distributed graph analytics over relational edge lists.

Connected components already live in ``operators/dedup.py`` (dup_clusters,
large/small-star).  This module adds the other classic iterative graph
primitive an analytics engine needs: fixed-iteration PageRank over an
edge list, expressed as K rounds of (join edges -> keyed aggregate) —
each round one hash exchange on the node key, AQE-friendly, no driver-side
state beyond the loop counter.  (SURVEY.md §2.J extension surface; the
co-purchase graph is the martech "customers who bought X also bought Y"
signal the reference's event pipelines feed downstream.)

Scale posture: edges are persisted and pre-partitioned by ``src`` once, so
every iteration's ranks-to-edges join reuses one side's partitioning; the
per-iteration shuffle moves only (node, contribution) pairs.  With a fixed
iteration count there is no unbounded lineage; callers doing 10+ rounds
should localCheckpoint the rank table every few iterations (same guidance
as dup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from martech_pipelines_spark import caching

# Join-strategy toggle for the two wedge-side joins in triangle_stats —
# None = planner default (sort-merge).  Module-level so an A/B harness
# can flip it inside one session; see OPTIMIZATION_r12.md (g2).
_WEDGE_JOIN_HINT: str | None = "SHUFFLE_HASH"


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase edges: (p1 -> p2) whenever parts p1 != p2 ship
    in the same order.  Both directions are emitted, duplicates collapsed.

    Round-6 plan: dedupe the (order, part) projection FIRST (an order
    listing a part on several lineitems contributes once), self-join ONE
    canonical projection with ``src < dst`` IN the join (ReuseExchange
    materializes the distinct's shuffle once for both inputs), dedupe the
    HALF-side pair set, and mirror it — the mirrored union is
    duplicate-free by construction, so the expensive distinct runs over
    half the rows of the old both-directions form and the second distinct
    disappears entirely.  Same keyed-shuffle discipline as
    ``copurchase_edges_undirected`` (never a cartesian); line-count skew
    per order stays bounded.
    """
    lp = lineitem.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    half = (
        lp.alias("a")
        .join(lp.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst).

    The node set is every id appearing as src or dst.  Nodes with no
    outgoing edges (dangling) contribute their mass uniformly — on a
    symmetric edge list (like co-purchase) there are none, and the
    uniform term folds into the teleport constant only when present.

    ``assume_no_dangling=True`` skips the per-iteration linked-mass
    aggregate + broadcast entirely: on a SYMMETRIC edge list every node
    that exists has out-degree >= 1, so the dangling mass is exactly 0
    by construction — the aggregate was measuring a constant.  Callers
    must only pass it when the edge list is mirrored (both directions
    present), as ``copurchase_edges`` guarantees; the generic default
    keeps the full Pregel-style redistribution.

    Returns (node, rank).  Ranks sum to 1 (up to float round-off) every
    iteration.  Deterministic up to floating-point summation order —
    callers comparing across engines should round.
    """
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one tiny job; the only driver-side scalar
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # Pre-attach outdegree so the per-iteration join is single
    edges_w = edges.join(out_deg, "src").persist()
    edges_w.count()  # materialize once; reused every iteration
    edges.unpersist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        if assume_no_dangling:
            # symmetric edge list: dangling mass is exactly 0 by
            # construction (every node has out-degree >= 1) — no
            # linked-mass job, no broadcast
            updated = nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        else:
            # Dangling mass: rank held by nodes with no outgoing edges is
            # redistributed uniformly.  Computed as 1 - sum(rank of nodes
            # WITH outdegree); on symmetric graphs this is exactly 0.
            linked_mass = (
                ranks.join(out_deg, ranks["node"] == out_deg["src"], "left_semi")
                .agg(F.sum("rank").alias("m"))
            )
            updated = (
                nodes.join(contribs, "node", "left")
                .crossJoin(F.broadcast(linked_mass))
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("inflow"), F.lit(0.0))
                            + (F.lit(1.0) - F.col("m")) / n
                        )
                    ).alias("rank"),
                )
            )
        # localCheckpoint each iteration: ranks_k feeds BOTH the contribs
        # join and (generic path) the linked-mass aggregate of iteration
        # k+1 — left lazy, the doubly-referenced subtree re-evaluates
        # 2^iterations times (measured 1.75x wall-clock at 3 iterations
        # on the sf0.1 graph).  Eager checkpoint materializes each rank
        # table once and truncates lineage, the same discipline as
        # dedup.dup_clusters.
        ranks = updated.localCheckpoint(eager=True)
    # ranks is checkpointed (materialized, lineage-free), so the cached
    # inputs can be released — without this every pagerank() call leaks
    # a node set + degree-annotated edge list into executor storage for
    # the session lifetime.
    nodes.unpersist()
    edges_w.unpersist()
    return ranks


def copurchase_edges_undirected(
    lineitem: DataFrame, min_support: int = 1
) -> DataFrame:
    """Undirected co-purchase edges, each pair once as (src < dst).

    For undirected consumers (triangle counting) this is the lean build:
    the ``src < dst`` predicate sits IN the self-join, so the join emits
    half the rows of ``copurchase_edges`` and the single keyed
    aggregation shuffles half the volume — vs deriving the undirected
    set from the both-directions list, which pays the full-volume
    distinct and then a second one after the filter.

    ``min_support`` keeps only pairs co-purchased in at least that many
    orders — the production density control for co-occurrence graphs:
    when the fact table grows against a fixed catalog (more orders, same
    parts), support-1 edge density inflates toward the complete graph
    and every downstream wedge/triangle cost inflates quadratically
    with it, while the signal lives in the repeated pairs.  Support
    thresholding costs nothing here (the pair aggregation already
    groups by the pair) and is how a real basket graph is built
    (mart10's rules are support-thresholded for the same reason).

    Support counts DISTINCT co-purchase orders: the (order, part)
    projection is deduplicated before the self-join (mart10's
    convention), so an order listing the same part on several lineitems
    contributes one co-occurrence, not a lineitem-pair product."""
    lp = lineitem.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p")
    ).distinct()
    # true self-join of ONE deduped projection: both sides canonicalize
    # to the same subplan, so ReuseExchange materializes the distinct
    # shuffle once and feeds it to both join inputs.
    pairs = (
        lp.alias("a")
        .join(lp.alias("b"), F.col("a.k") == F.col("b.k"))
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("__support"))
    )
    if min_support > 1:
        pairs = pairs.where(F.col("__support") >= min_support)
    return pairs.select("src", "dst")


def triangle_stats(
    edges: DataFrame, top_n: int = 20, undirected: bool = False
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph given as a both-directions edge list (src, dst)
    like ``copurchase_edges`` emits — or, with ``undirected=True``, an
    already-deduplicated (src < dst) list like
    ``copurchase_edges_undirected``'s, which skips the re-filter +
    re-distinct here.

    Enumeration uses DEGREE-ORDERED ORIENTATION (the MapReduce triangle
    counting of Suri & Vassilvitskii, WWW'11): each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher, so
    every node's out-degree is O(sqrt(m)) and the wedge self-join fans
    out per-node quadratically in THAT bound instead of in raw degree —
    the difference between a feasible and an exploding plan when the
    graph has hubs (every co-purchase graph does).  Each triangle is
    found exactly once: at its lowest-ordered vertex, closed by the
    oriented edge between the two higher endpoints.  Triangle counts are
    orientation-invariant, so an id-ordered oracle enumeration agrees
    value-for-value.

    Shuffles: one distinct on the undirected edge, one degree agg, two
    node-keyed degree joins, the wedge self-join on the pivot node, one
    (lo, hi)-keyed closing join, one corner agg.  All keyed — never an
    all-pairs product.  ``und``, ``deg`` and ``oriented`` each feed 2-3
    consumers, so they are persisted (registered with
    ``caching.register`` — release with ``caching.scope()`` after the
    action) — otherwise the lazy plan re-derives the upstream edge
    build once per consumer (observed 35 exchanges unpersisted vs ~8
    persisted on the co-purchase graph).

    Returns nodes with >= 1 triangle: (node, degree, triangles,
    clustering = 2T / d(d-1), rounded 6dp), ordered by (triangles DESC,
    node ASC), limited to ``top_n`` — a total deterministic order, so
    the cut is engine-stable.
    """
    if undirected:
        raw = edges.select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        )
    else:
        raw = (
            edges.where(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .distinct()
        )
    und = caching.register(raw.persist(StorageLevel.MEMORY_AND_DISK))
    deg = caching.register(
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with_deg = (
        und.join(
            deg.select(F.col("node").alias("a"), F.col("degree").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("degree").alias("db")),
            "b",
        )
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = caching.register(
        with_deg.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dhi"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    o1 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("dhi").alias("dv")
    )
    o2 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("dhi").alias("dw")
    )
    # each unordered wedge once: v strictly before w in the orientation
    # order, so the closing edge (if present) is oriented v -> w.
    #
    # Both wedge-side joins request SHUFFLE_HASH (guide §3.1): the build
    # sides are edge-sized (m rows split across partitions) while the
    # probe side is the wedge stream (sum of out-deg^2 rows — 13M/397 MB
    # at sf0.1).  Sort-merge would SORT that wedge stream on (v, w)
    # before probing; the hash join streams it unsorted past a per-
    # partition hash table of edges, removing the plan's single biggest
    # sort while keeping the keyed-shuffle scale shape (no broadcast of
    # a data-scale side).
    o2h = o2.hint(_WEDGE_JOIN_HINT) if _WEDGE_JOIN_HINT else o2
    wedges = o1.join(o2h, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    closingh = closing.hint(_WEDGE_JOIN_HINT) if _WEDGE_JOIN_HINT else closing
    tris = wedges.join(closingh, ["v", "w"]).select(
        "u", "v", "w"
    )
    corners = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        corners.join(deg, "node")
        .select(
            "node",
            "degree",
            "triangles",
            F.round(
                F.lit(2.0)
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering"),
        )
        .orderBy(F.col("triangles").desc(), F.col("node"))
        .limit(top_n)
    )


def link_prediction(
    und_edges: DataFrame, min_common: int = 2, top_n: int = 50
) -> DataFrame:
    """Common-neighbors link prediction over an undirected (src < dst)
    edge list: score every NON-adjacent pair by how many neighbors it
    shares — "bought with the same partners but never together", the
    classic co-purchase recommendation candidate generator.

    Wedge enumeration here is UNORIENTED (a pair's common-neighbor
    count needs every center, not just the lowest-ordered one that
    triangle counting keys on), so the cost is the true wedge count
    Σ C(deg(u), 2).  That makes the EDGE DENSITY the scale knob, not
    the algorithm: feed this a support-thresholded graph
    (``copurchase_edges_undirected(min_support=...)``) — exactly what a
    production recommender does, because support-1 co-occurrence edges
    are noise for recommendation anyway.  Output is bounded: pairs with
    >= ``min_common`` shared neighbors, Jaccard-scored, total-ordered
    (common DESC, pair ASC), top-N.

    Shuffles: one union-adjacency self-join on the center node, one
    pair agg, one anti-join against the (persisted) edge set, two
    degree joins on the surviving candidates only.
    """
    edges = caching.register(
        und_edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj = edges.select(F.col("src").alias("u"), F.col("dst").alias("n")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("n"))
    )
    deg = adj.groupBy(F.col("n").alias("node")).agg(
        F.count("*").alias("degree")
    )
    w1 = adj.select(F.col("u"), F.col("n").alias("a"))
    w2 = adj.select(F.col("u"), F.col("n").alias("b"))
    cand = (
        w1.join(w2, "u")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common_neighbors"))
        .where(F.col("common_neighbors") >= min_common)
    )
    non_adjacent = cand.join(
        edges.select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        ),
        ["a", "b"],
        "left_anti",
    )
    scored = (
        non_adjacent.join(
            deg.select(F.col("node").alias("a"), F.col("degree").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("degree").alias("db")),
            "b",
        )
        .select(
            F.col("a").alias("p1"),
            F.col("b").alias("p2"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("da") + F.col("db") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("common_neighbors").desc(), "p1", "p2"
    ).limit(top_n)


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection) with a
    DETERMINISTIC update rule: every node starts as its own label; each
    round, a node adopts the most frequent label among its neighbors,
    ties to the SMALLEST label — so a fixed iteration count yields an
    engine-exact assignment (the classic async/random-order LPA is
    unreproducible by construction; sync + total tie-break is the form
    a verification-first engine ships, same determinism contract as the
    ANN family).  Output: (node, label) after ``iters`` rounds.

    Scale shape per round: one join of the (src, dst) edge list against
    the |V|-row label table (labels broadcast when dims allow, else a
    keyed exchange) + one two-level mode aggregation with map-side
    combine on (node, lab).  T rounds = T keyed shuffles of skinny
    rows; no iteration ever touches more than |E| + |V| rows, the
    large-star/small-star discipline (dedup.py CC) applied to
    community labels."""
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).distinct()
    labels = sym.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(iters):
        nbr = sym.join(
            labels.select(F.col("node").alias("d"), "lab"), "d"
        ).select(F.col("s").alias("node"), "lab")
        counts = nbr.groupBy("node", "lab").agg(F.count("*").alias("c"))
        best = counts.groupBy("node").agg(
            F.max(F.struct(F.col("c"), (-F.col("lab")).alias("nl"))).alias("__b")
        )
        labels = best.select("node", (-F.col("__b.nl")).alias("lab"))
    return labels.select("node", F.col("lab").alias("label"))


def cc_label_min_rounds(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Connected-components labeling by SYNC min-label propagation for a
    FIXED number of rounds — the deterministic, oracle-able member of
    the CC family (the g4 label-propagation discipline applied to the
    min-label rule): after ``rounds`` steps every node carries the
    smallest node id within ``rounds`` hops, which equals the true
    component min once rounds >= the component diameter.  The
    fixpoint-iterating production form (used by the dedup clustering)
    keeps its convergence loop; this fixed-round twin unrolls into CTEs
    and carries a full DuckDB oracle (g5).

    Expects DIRECTED edges with both orientations present (the
    copurchase_edges contract).  Scale shape per round: one keyed join
    of the label table against the edge list + one map-side-combined
    min agg — labels and edges shuffle, never any payload."""
    nodes = edges.select(F.col("src").alias("node")).distinct()
    lab = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(rounds):
        incoming = (
            edges.join(lab, edges["src"] == lab["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("__minlbl"))
        )
        lab = (
            lab.join(incoming, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("__minlbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
    return lab


def kcore_rounds(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """K-core decomposition by SYNC peeling for a FIXED number of
    rounds — the deterministic, oracle-able member of the density
    family (the g5 fixed-round discipline applied to the peel rule):
    each round recomputes every surviving node's degree within the
    survivor-induced subgraph and drops nodes below ``k``; after
    ``rounds`` passes the survivor set equals the true k-core whenever
    peeling stabilizes that fast (peeling removes at least one node per
    round until fixpoint, so round count bounds the cascade depth
    honored).  Returns (node, deg): the survivors of the final round
    with the degree that round measured.

    Expects DIRECTED edges with both orientations present (the
    copurchase_edges contract), so a groupBy(src) count IS the
    undirected degree.  Scale shape — DECREMENT peeling, not
    recount-from-scratch: round 1 computes full degrees once; every
    later round joins the edge list against only the NEWLY DROPPED
    node set (small once the peel bites — AQE broadcasts it at
    runtime) and subtracts the per-survivor decrement, so the
    survivor-induced degree is maintained without ever semi-joining
    edges against the full alive set.  deg_i(v) = deg_{i-1}(v) −
    |edges v→dropped_{i-1}| restricted to survivors is exactly the
    degree within the survivor-induced subgraph: edges between two
    dropped nodes produce decrements only for dropped sources, which
    the survivor filter discards, and a node dropped in round j never
    reappears, so no edge is subtracted twice.  (A measured
    alternative was rejected: persisting the edge list for the
    recount form read 3x SLOWER at sf0.1 — 5.6s → 16.6s solo
    best-of-5 — materializing tens of millions of edge rows costs
    more than the reuse saves.)"""
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    for _ in range(rounds - 1):
        dropped = deg.where(F.col("deg") < k).select(
            F.col("node").alias("__gone")
        )
        dec = (
            edges.join(dropped, edges["dst"] == F.col("__gone"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.count("*").cast("long").alias("__dec"))
        )
        deg = (
            deg.where(F.col("deg") >= k)
            .join(dec, "node", "left")
            .select(
                "node",
                (F.col("deg") - F.coalesce("__dec", F.lit(0)))
                .cast("long")
                .alias("deg"),
            )
        )
    return deg.where(F.col("deg") >= k)


def bfs_hops_rounds(
    edges: DataFrame, seeds: DataFrame, rounds: int = 4
) -> DataFrame:
    """Single/multi-source BFS hop distances by SYNC frontier expansion
    for a FIXED number of rounds — the g5 fixed-round discipline
    applied to shortest hops: after ``rounds`` steps every node within
    ``rounds`` hops of a seed carries its EXACT hop distance (min-dist
    propagation converges level by level; unreached nodes are absent).
    Unrolls into CTEs for a full DuckDB oracle (g8).

    ``seeds`` is a 1-column (``node``) frame — control-plane sized
    (one or a handful of query nodes), broadcast into the first join.
    Expects DIRECTED edges with both orientations present (the
    copurchase_edges contract).  Scale shape per round: one keyed join
    of the current distance table against the edge list + one
    map-side-combined min — same currency as cc_label_min_rounds."""
    dist = seeds.select("node", F.lit(0).cast("long").alias("hops"))
    for _ in range(rounds):
        reached = (
            edges.join(dist, edges["src"] == dist["node"])
            .select(
                F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops")
            )
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("hops").cast("long").alias("hops"))
        )
    return dist
