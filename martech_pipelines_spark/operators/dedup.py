"""Deduplication operators (north-star surface, BASELINE.json).

Four families, all shuffle-disciplined for 100-TB corpora:

- **Exact**: hash-groupBy on normalized text (one shuffle on a 32-byte
  key, map-side combine).
- **MinHash + LSH**: shingle -> per-permutation min-hash signature ->
  banded bucket join -> exact-Jaccard verification of candidates. The
  pair join happens only *within LSH buckets*, never all-pairs.
- **SimHash**: bit-majority fingerprint over token hashes; near-dups =
  banded fingerprint collisions.
- **Embedding cosine**: see operators/similarity.py (near-dup = cosine
  above threshold).

Hash choice: md5 (SQL-portable => DuckDB-oracle-checkable, deterministic
across engines and runs). Swapping to xxhash64 for production speed
changes one function and no plan shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from martech_pipelines_spark.operators.text import (
    fingerprint,
    md5_bucket32 as _md5_bucket32,
    normalized_text,
    shingles,
    tokens,
)


# --- exact dedup -------------------------------------------------------------


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative per normalized-text fingerprint.

    groupBy on the md5 fingerprint: the shuffle key is 32 bytes regardless
    of document size, and min() gets map-side partial aggregation."""
    keyed = docs.withColumn("__fp", fingerprint(F.col(text_col)))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def duplicate_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-dup group table: fingerprint, group size, representative id."""
    return (
        docs.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(
            F.count("*").alias("group_size"),
            F.min(id_col).alias("representative"),
        )
    )


def cross_source_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source contamination audit: how many of a source's docs have an
    exact-duplicate fingerprint that also appears in ANOTHER source — the
    standard leakage/contamination check before mixing corpora into a
    training set. Two keyed aggregations on the 32-byte fingerprint plus
    one broadcast-sized join back of the per-fingerprint source counts;
    never a doc-to-doc self-join."""
    keyed = docs.select(
        F.col(id_col), F.col(source_col), fingerprint(F.col(text_col)).alias("fp")
    )
    fp_sources = keyed.groupBy("fp").agg(
        F.count_distinct(source_col).alias("n_sources")
    )
    return (
        keyed.join(fp_sources, "fp")
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0)).alias(
                "n_cross_source"
            ),
        )
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over the near-dup pair graph: cluster id =
    min member id. Pair output alone under-deduplicates — near-dup is
    transitive in practice (A~B, B~C => one cluster {A,B,C}), so keeping
    one representative PER CLUSTER, not per pair, is what an actual
    dedup pass needs.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(component
    diameter) rounds (near-dup components are shallow — tiny diameters).
    The driver loop is the legitimate pattern for iterative algorithms:
    each iteration is a distributed join+agg, `localCheckpoint` truncates
    the growing lineage, and the convergence test is one count per round.
    At extreme scale swap the iteration body for the large-star/small-star
    variant (alternating asymmetric joins) — same loop skeleton."""
    edges_fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # Materialize the symmetric edge table ONCE: `pairs` is typically the
    # whole LSH candidates+verify pipeline, and every iteration references
    # edges twice (neighbor join + convergence count) — without this the
    # full upstream lineage would re-execute 2x per round.
    # Lazy checkpoint (round 12, guide §1.2): the first convergence
    # count materializes it as part of its own job — an eager checkpoint
    # here was a whole extra Spark job before the loop even started.
    edges = edges_fwd.union(
        edges_fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            # lazy: the changed-count join right below is the action that
            # materializes this round's labels — 1 job/round, not 2
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); the component diameter "
            "exceeds the iteration budget — raise max_iter or switch to "
            "the large-star/small-star variant"
        )
    return labels.select("id", F.col("label").alias("cluster"))


# --- MinHash signatures ------------------------------------------------------


def minhash_signature(col: Column, num_perm: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature (array<long>, length ``num_perm``) of a text
    column: slot i = min over shingles of md5(i + ":" + shingle). Empty
    shingle sets yield null slots (filtered by callers).

    Permutations are unrolled in Python (the index must be a *literal* in
    each salt), producing one flat codegen stage — no UDF, no shuffle.

    NB: the per-permutation lambdas MUST be single-parameter closures built
    by a factory — a ``lambda s, i=i`` default-arg form makes PySpark treat
    the lambda as binary and silently bind the *array index* to ``i``."""
    sh = shingles(col, shingle_n)

    def hasher(perm: int):
        return lambda s: _md5_bucket32(s, perm)

    slots = []
    for i in range(num_perm):
        slots.append(F.array_min(F.transform(sh, hasher(i))))
    return F.array(*slots)


_minhash_sig = minhash_signature


def exploded_shingles(
    docs: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(id, shingle) rows — tokenization runs ONCE per document here; every
    downstream hash/aggregate works on the exploded rows. This is the
    100-TB-shaped formulation: nested higher-order-function variants
    recompute the tokenize subtree per permutation (no CSE inside Catalyst
    lambdas) and blow up codegen."""
    from martech_pipelines_spark.operators.parallelism import spread

    narrow = spread(docs.select(F.col(id_col).alias("id"), F.col(text_col)), by="id")
    return narrow.select(
        "id",
        F.explode(shingles(F.col(text_col), shingle_n)).alias("s"),
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures as columns (id, m0..m{P-1}): explode shingles,
    hash P ways per row, min-aggregate per doc. Map-side combine shrinks
    the shuffle to one row per (doc, P mins); docs with no shingles drop
    out (matching the column-form null filtering)."""
    expl = exploded_shingles(docs, text_col, id_col, shingle_n)
    aggs = [
        F.min(_md5_bucket32(F.col("s"), i)).alias(f"m{i}") for i in range(num_perm)
    ]
    return expl.groupBy("id").agg(*aggs)


def _band_key_exprs(num_perm: int, bands: int) -> list[Column]:
    """Per-band bucket keys: md5 over the band's slice of signature
    columns m0..m{P-1}. Shared by the inline pipeline, the candidate-pair
    helper, and the materialized two-stage form so the banding arithmetic
    cannot drift between them."""
    rows_per_band = num_perm // bands
    keys = []
    for b in range(bands):
        start = b * rows_per_band
        keys.append(
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"m{start + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            )
        )
    return keys


def _jaccard_scored(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for a (id_a, id_b) pair table given an
    (id, sh) set table — the shared verify join of the inline, rejoin,
    and materialized pipelines."""
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(union > 0, F.round(inter / union, 4))
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def minhash_signature_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc (id, m0..m{P-1}, sh) signature rows — the one construction
    shared by index build, incremental probe, and the streaming ingest
    sink, so a signature written by any of them is readable by all."""
    expl = exploded_shingles(docs, text_col, id_col, shingle_n)
    aggs = [
        F.min(_md5_bucket32(F.col("s"), i)).alias(f"m{i}") for i in range(num_perm)
    ]
    return expl.groupBy("id").agg(*aggs, F.collect_set("s").alias("sh"))


def minhash_build_index(
    docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> None:
    """Stage 1 of the materialized two-stage MinHash form (the
    minhash_near_duplicates docstring promise): ONE scan over the raw
    corpus computes, per doc, the P min-hash slots AND the shingle set,
    and writes them to ``{index_path}/signatures`` parquet.

    Carrying the shingle set in the index is the space-for-rescans trade:
    stage 2 (candidates + exact-Jaccard verify) then reads ONLY the
    index — re-runs with different (threshold, bands) sweeps never touch
    the 100-TB raw corpus again. Banding is NOT materialized: band keys
    are a cheap projection over m0..m{P-1} at probe time, so one index
    serves every ``bands`` choice that divides ``num_perm``."""
    per_doc = minhash_signature_table(docs, text_col, id_col, num_perm, shingle_n)
    # batch_id=-1 marks the initial build; streaming ingest appends its
    # batches as sibling batch_id=N directories with per-batch overwrite,
    # which makes micro-batch REPLAY idempotent (see
    # streaming.streaming_minhash_ingest). Readers scan the parent dir
    # and select explicit columns, so the partition column is inert.
    per_doc.write.mode("overwrite").parquet(
        f"{index_path}/signatures/batch_id=-1"
    )


def minhash_compact_index(spark: SparkSession, index_path: str) -> None:
    """Nightly compaction of a stream-maintained MinHash index: folds
    the per-micro-batch ``signatures/batch_id=N`` directories into one
    ``batch_id=-1`` via ``sinks.compact_batch_dirs``'s crash-safe swap.
    Probe answers (dd3c / dd10) are invariant — readers scan the parent
    dir and treat batch_id as inert; what changes is the file count a
    long-running ingest leaves behind."""
    from martech_pipelines_spark.operators.sinks import compact_batch_dirs

    compact_batch_dirs(spark, f"{index_path}/signatures")


def minhash_index_near_duplicates(
    spark: SparkSession,
    index_path: str,
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Stage 2: LSH candidates + exact-Jaccard verify reading ONLY the
    materialized signature table — zero raw-document scans (pinned by a
    plan assertion in tests/test_plans.py). Identical results to the
    inline ``minhash_near_duplicates`` (shared oracle, dd3c)."""
    from martech_pipelines_spark.operators.sinks import recover_dir_swap

    recover_dir_swap(f"{index_path}/signatures")  # self-heal compaction
    per_doc = spark.read.parquet(f"{index_path}/signatures")
    band_rows = per_doc.select(
        "id", F.posexplode(F.array(*_band_key_exprs(num_perm, bands))).alias(
            "band", "band_key"
        )
    )
    cand = (
        band_rows.select("band", "band_key", F.col("id").alias("id_a"))
        .join(
            band_rows.select("band", "band_key", F.col("id").alias("id_b")),
            ["band", "band_key"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    scored = _jaccard_scored(cand, per_doc.select("id", "sh"))
    return scored.where(F.col("jaccard") >= threshold)


def minhash_incremental_dedup(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental ingest dedup: near-dup pairs touching the NEW batch
    only — new-vs-index and new-vs-new — against a corpus whose
    signatures were materialized once by ``minhash_build_index``.

    This is THE steady-state 100-TB dedup shape: the index side is never
    re-shingled and its raw documents are never re-read (only the skinny
    signature table is scanned — structural, since the raw index corpus
    is not even an input here), and index-vs-index pairs are never
    generated because the band join is anchored on the batch side. Cost
    scales with |batch| x collision rate, not |corpus|^2 or even
    |corpus|.

    Output contract matches the other minhash forms — (id_a, id_b,
    jaccard) normalized to id_a < id_b, distinct across bands, exact
    Jaccard >= threshold — restricted to pairs with at least one batch
    member, so the full-corpus oracle filtered to batch ids is the exact
    oracle (dd10). Batch signatures are persisted (registered with
    ``caching``) because bands and verify both read them."""
    from pyspark.storagelevel import StorageLevel

    from martech_pipelines_spark import caching

    from martech_pipelines_spark.operators.sinks import recover_dir_swap

    recover_dir_swap(f"{index_path}/signatures")  # self-heal compaction
    idx = spark.read.parquet(f"{index_path}/signatures")
    new_sig = minhash_signature_table(new_docs, text_col, id_col, num_perm, shingle_n)
    new_sig = caching.register(new_sig.persist(StorageLevel.MEMORY_AND_DISK))

    def band_rows(df: DataFrame) -> DataFrame:
        return df.select(
            "id",
            F.posexplode(F.array(*_band_key_exprs(num_perm, bands))).alias(
                "band", "band_key"
            ),
        )

    batch_bands = band_rows(new_sig)
    all_bands = band_rows(idx).unionByName(batch_bands)
    cand = (
        batch_bands.select("band", "band_key", F.col("id").alias("id_n"))
        .join(
            all_bands.select("band", "band_key", F.col("id").alias("id_o")),
            ["band", "band_key"],
        )
        .where(F.col("id_o") != F.col("id_n"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
        .distinct()
    )
    sets = idx.select("id", "sh").unionByName(new_sig.select("id", "sh"))
    return _jaccard_scored(cand, sets).where(F.col("jaccard") >= threshold)


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b), deduplicated across bands.

    Plan shape: explode -> P-way hash min-agg (one keyed shuffle, combined
    map-side) -> band projection (narrow union) -> shuffle on (band,
    band_key) -> in-bucket self-join -> distinct pairs. The only joins are
    within buckets; a bucket's expected size is corpus_size * P(collision),
    so skew only appears if many documents truly share a band — which is
    exactly the signal.

    ``signatures``: an optional precomputed ``minhash_signatures`` table
    (id, m0..m{P-1}) so callers sweeping several band configs over the
    SAME signatures (dd21) hash the corpus once, not once per config.
    """
    with_sig = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, text_col, id_col, num_perm, shingle_n)
    )
    band_rows = with_sig.select(
        "id",
        F.posexplode(F.array(*_band_key_exprs(num_perm, bands))).alias(
            "band", "band_key"
        ),
    )

    left = band_rows.select("band", "band_key", F.col("id").alias("id_a"))
    right = band_rows.select("band", "band_key", F.col("id").alias("id_b"))
    pairs = (
        left.join(right, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def jaccard_on_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the LSH verify step).

    Joins the (small) candidate-pair table back to per-doc shingle sets;
    intersection/union via array functions — no explode, no extra shuffle
    beyond the two hash joins."""
    sh = docs.select(
        F.col(id_col).alias("jid"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col("jid").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("jid").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(union > 0, F.round(inter / union, 4)).otherwise(F.lit(0.0)).alias("jaccard"),
        )
    )


def minhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    cache_intermediate: bool = True,
    verify: str = "carried",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact-Jaccard verify.

    ``verify`` picks how the exact-Jaccard step obtains shingle sets —
    both produce identical results (shared oracle):

    - ``"carried"`` (default): collect_set the shingles through the same
      groupBy that computes the signatures. One corpus scan total, but
      collect_set partials ARE the sets, so the keyed shuffle scales with
      total corpus shingles. Wins when many docs are candidates (dense
      dup corpora — the planted test corpus is ~30% dups, where this form
      benches ~25% faster).
    - ``"rejoin"``: keep the signature aggregation SKINNY (min() gets real
      map-side combine; the shuffle carries P longs per doc) and re-derive
      shingle sets for CANDIDATE docs only via a semi-join-pruned second
      scan. Wins when candidates are rare — the normal 100-TB case
      (near-dup rate a few %), where shuffling every doc's shingle set
      dwarfs a pruned re-scan.

    Flip criterion: expected candidate-doc share. Below ~10% of the
    corpus, use ``rejoin``; above, ``carried``.

    ``cache_intermediate`` persists the tables each plan reads twice
    (signature table for the self-join; rejoin's candidate sets for the
    pair join); callers release via ``caching.release()`` after their
    action. For a truly huge corpus, materialize signatures to a table and
    run candidates/verify as a second job (two-stage form:
    ``minhash_signatures`` + ``lsh_candidate_pairs`` +
    ``jaccard_on_pairs``)."""
    from pyspark.storagelevel import StorageLevel

    from martech_pipelines_spark import caching

    if verify not in ("carried", "rejoin"):
        raise ValueError(f"verify must be 'carried' or 'rejoin', got {verify!r}")
    sig_aggs = [
        F.min(_md5_bucket32(F.col("s"), i)).alias(f"m{i}") for i in range(num_perm)
    ]
    if verify == "carried":
        expl = exploded_shingles(docs, text_col, id_col, shingle_n)
        per_doc = expl.groupBy("id").agg(*sig_aggs, F.collect_set("s").alias("sh"))
    else:
        per_doc = minhash_signatures(docs, text_col, id_col, num_perm, shingle_n)
    if cache_intermediate:
        # Registered so callers can caching.release() after their action —
        # repeated invocations in one session must not accumulate caches.
        per_doc = caching.register(per_doc.persist(StorageLevel.MEMORY_AND_DISK))

    # Skinny band rows (ids + 32-byte key only). One posexplode pass, NOT a
    # per-band union — union branches differ by a literal, so Catalyst
    # cannot reuse the aggregation exchange across them and would re-run
    # the whole explode+agg once per band.
    band_rows = per_doc.select(
        "id",
        F.posexplode(F.array(*_band_key_exprs(num_perm, bands))).alias(
            "band", "band_key"
        ),
    )

    cand = (
        band_rows.select("band", "band_key", F.col("id").alias("id_a"))
        .join(
            band_rows.select("band", "band_key", F.col("id").alias("id_b")),
            ["band", "band_key"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    if verify == "carried":
        sets = per_doc.select("id", "sh")
    else:
        cand_ids = (
            cand.select(F.col("id_a").alias("id"))
            .union(cand.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sets = docs.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
        ).join(cand_ids, "id", "left_semi")
        if cache_intermediate:
            sets = caching.register(sets.persist(StorageLevel.MEMORY_AND_DISK))

    scored = _jaccard_scored(cand, sets)
    return scored.where(F.col("jaccard") >= threshold)


# --- SimHash -----------------------------------------------------------------


def simhash32(col: Column) -> Column:
    """32-bit SimHash over word tokens: bit j of the fingerprint is the
    majority vote of bit j across all token hashes.

    Expressed as 32 aggregate-over-array folds — heavy-looking but pure
    codegen, no shuffle; ~100 ns/token/bit in practice. For production,
    narrow to 16 bits or precompute token hashes once."""
    toks = F.array_distinct(tokens(normalized_text(col)))
    hashed = F.transform(toks, lambda t: _md5_bucket32(t, "sim"))

    def vote_merge(bit: int):
        # closure factory, NOT a default-arg lambda (see minhash_signature)
        def merge(acc, h):
            is_set = F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1
            return acc + F.when(is_set, F.lit(1)).otherwise(F.lit(-1))

        return merge

    bits = []
    for j in range(32):
        vote = F.aggregate(hashed, F.lit(0), vote_merge(j))
        bits.append(F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return F.when(F.size(toks) > 0, out.cast("long"))


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash as (id, h): explode distinct tokens, hash once per token,
    32 conditional-sum bit votes in ONE aggregation pass (map-side
    combined) — the scale-shaped equivalent of ``simhash32``."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(normalized_text(F.col(text_col))))).alias("t"),
    )
    hashed = tok.select("id", _md5_bucket32(F.col("t"), "sim").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(32)
    ]
    per_doc = hashed.groupBy("id").agg(*votes)
    fp = None
    for j in range(32):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return per_doc.select("id", fp.cast("long").alias("h"))


def simhash_near_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dups by SimHash: block on 8-bit bands (pigeonhole: hamming<=3
    over 4 bands guarantees one exact band match), verify hamming distance
    on candidates."""
    with_h = simhash_fingerprints(docs, text_col, id_col)

    band_vals = [
        F.shiftright("h", b * 8).bitwiseAND(F.lit(0xFF)) for b in range(4)
    ]
    band_rows = with_h.select(
        "id", "h", F.posexplode(F.array(*band_vals)).alias("band", "band_val")
    )

    left = band_rows.select("band", "band_val", F.col("id").alias("id_a"), F.col("h").alias("h_a"))
    right = band_rows.select("band", "band_val", F.col("id").alias("id_b"), F.col("h").alias("h_b"))
    cand = (
        left.join(right, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# --- n-gram Jaccard on aligned pairs ----------------------------------------


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Word n-gram Jaccard for an explicit pair table (blocking-free
    verification path; LSH provides the blocking at scale)."""
    return jaccard_on_pairs(pairs, docs, text_col, id_col, shingle_n=n)


# --- benchmark decontamination -----------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval contamination audit: for every training doc, count its
    w-token windows that also occur anywhere in the eval (benchmark) set —
    the standard decontamination pass before an LLM training run (the
    GPT-3/PaLM reports use 8-13-gram overlap exactly like this). Output:
    (doc_id, n_eval_hits, contaminated).

    Scale shape: the EVAL side is small by nature (benchmarks are
    thousands of docs, the training corpus is billions), so its distinct
    window-hash set is broadcast — the train corpus is scanned once,
    map-side filtered against the broadcast set, and aggregated per doc.
    No shuffle touches the full train window table; this is the one
    dedup-family operator where a broadcast IS the 100-TB design (contrast
    ``substring_dup_stats``, where both sides are the corpus)."""
    from martech_pipelines_spark.operators.text import _window_table

    twin = _window_table(train, w, text_col, id_col)
    ewin = _window_table(eval_docs, w, text_col, id_col).select("h").distinct()
    hits = (
        twin.join(F.broadcast(ewin), "h")
        .groupBy(id_col)
        .agg(F.count_distinct("h").alias("n_eval_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --- connected components, large-star/small-star form ------------------------


def _symmetric(e: DataFrame) -> DataFrame:
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every LARGER neighbor to min(N(u) + {u})."""
    sym = _symmetric(e)
    m = sym.groupBy("src").agg(F.min("dst").alias("mn")).select(
        "src", F.least("src", "mn").alias("mn")
    )
    return (
        sym.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge large->small; for each node u: connect its smaller
    neighbors (and u itself) to min(N-(u) + {u})."""
    oriented = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    m = oriented.groupBy("src").agg(F.min("dst").alias("mn")).select(
        "src", F.least("src", "mn").alias("mn")
    )
    joined = oriented.join(m, "src")
    out = joined.select(F.col("dst").alias("src"), F.col("mn").alias("dst")).union(
        m.select(F.col("src"), F.col("mn").alias("dst"))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def dup_clusters_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """``dup_clusters`` via alternating large-star/small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond")
    — the documented swap for graphs whose component DIAMETER exceeds a
    sane iteration budget: min-label propagation needs O(diameter) rounds
    (a 10k-link near-dup chain = 10k rounds), the star algorithm
    converges in O(log n) because each round rewires whole neighborhoods
    onto their minima, not just adjacent nodes. Near-dup graphs are
    usually shallow (use ``dup_clusters``); crawl-scale boilerplate
    chains are not (use this). SAME output contract: (id, cluster) with
    cluster = min member id; dd7b shares dd7's recursive-CTE oracle.

    Each round is two join+agg phases over the current edge set; edges
    are ``localCheckpoint``ed per round to truncate lineage, convergence
    = edge-set fixpoint (count equality + empty symmetric difference)."""
    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .union(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        # lazy: round 1's star joins materialize it inside their own job
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        # lazy: the convergence count below materializes this round's edges
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        if new_edges.count() == edges.count() and (
            new_edges.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new_edges
            converged = True
            break
        edges = new_edges
    if not converged:
        raise RuntimeError(
            f"dup_clusters_star did not reach an edge fixpoint within "
            f"max_iter={max_iter} rounds"
        )
    # fixpoint edges are stars rooted at each component's min id
    roots = edges.groupBy("src").agg(F.min("dst").alias("root"))
    return nodes.join(roots, nodes.id == roots.src, "left").select(
        F.col("id"),
        F.least(F.col("id"), F.coalesce("root", F.col("id"))).alias("cluster"),
    )


# --- paragraph-level dedup (CCNet-style) -------------------------------------


def paragraph_dedup(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style paragraph dedup (Wenzek et al. 2020 §3.2): split every
    doc into paragraph units, hash each, keep only the corpus-wide FIRST
    occurrence of every distinct paragraph (ordered by doc id then
    position), and rebuild doc text from the surviving paragraphs. Output:
    (id, n_paras, n_kept, text_kept) — docs whose every paragraph appeared
    earlier elsewhere come back with ``text_kept = ''``.

    The paragraph unit here is a k-token chunk (single-line corpus; a real
    multi-line corpus swaps ``paragraph_chunks`` for ``split(text,'\\n')``
    — every other part of the plan is unit-agnostic).

    Scale shape: the corpus is tokenized ONCE (projection attribute,
    then one posexplode); the only corpus-sized shuffles key on the
    32-byte paragraph hash (first-occurrence window) and the doc id (the
    rebuild agg). Totals and survivors come out of the SAME per-doc agg
    — dropped paragraphs count toward ``n_paras`` but contribute null to
    the ``collect_list`` rebuild, so the raw text is never re-read. The
    final join against the id-only doc scan (for zero-paragraph docs)
    prunes to one column. Nothing is all-pairs and nothing round-trips
    the driver; at 100 TB the hash shuffle dominates — exact_dedup's
    shape at paragraph granularity (~10x the rows of doc-level, 1/k the
    rows of window-level dd8)."""
    from martech_pipelines_spark.operators.text import paragraph_chunks

    toks_df = docs.select(
        F.col(id_col), tokens(normalized_text(F.col(text_col))).alias("__tk")
    )
    paras = toks_df.select(
        F.col(id_col),
        F.posexplode(paragraph_chunks(F.col("__tk"), k)).alias("para_idx", "para"),
    )
    w = Window.partitionBy(F.md5("para")).orderBy(F.asc(id_col), F.asc("para_idx"))
    first = F.col("rnk") == 1
    per_doc = (
        paras.withColumn("rnk", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.sum(F.when(first, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(first, F.struct("para_idx", "para")))
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("text_kept"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )


# --- contamination overlap fraction ------------------------------------------


def contamination_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``decontaminate``'s scoring twin: instead of a boolean flag, report
    WHAT FRACTION of each training doc's w-token windows appear in the
    eval set — the number a filtering threshold actually tunes against
    (PaLM/Llama reports threshold on overlap fraction, not membership).
    Output: (id, n_windows, n_hit_windows, overlap_frac) for all train
    docs with >= 1 window.

    Same 100-TB shape as ``decontaminate``: the eval window-hash set is
    broadcast (benchmarks are tiny by nature), the train corpus is
    scanned once, and both counters come out of ONE per-doc aggregation —
    the hit counter is a conditional sum against the broadcast membership
    via a left semi-ish join trick: windows LEFT JOIN eval hashes, count
    matches."""
    from martech_pipelines_spark.operators.text import _window_table

    twin = _window_table(train, w, text_col, id_col)
    ewin = (
        _window_table(eval_docs, w, text_col, id_col)
        .select(F.col("h").alias("eh"))
        .distinct()
    )
    joined = twin.join(F.broadcast(ewin), twin["h"] == ewin["eh"], "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("eh").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hit_windows"),
        )
        .select(
            F.col(id_col),
            "n_windows",
            "n_hit_windows",
            F.round(F.col("n_hit_windows") / F.col("n_windows"), 4).alias(
                "overlap_frac"
            ),
        )
    )


def keep_best_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Canonical-document selection: given per-doc quality scores and the
    near-dup cluster labels from ``dup_clusters``/``dup_clusters_star``,
    keep exactly ONE doc per cluster — the highest-quality member, doc-id
    tiebreak. Docs absent from ``clusters`` (never paired) are singleton
    clusters labeled by their own id, so the output is the full
    deduplicated corpus decision, not just the paired subset.

    This is the keep/drop step every near-dedup pipeline runs after
    clustering (CCNet/RefinedWeb keep one representative per cluster);
    the reference has no analog — it is part of the extended
    training-data surface.

    Returns (cluster, keep_id, quality) — one row per cluster.

    Scale shape: one broadcast-or-shuffle left join docs->labels (the
    label table is |paired docs| rows, far smaller than the corpus) and
    one keyed top-1 window; Spark plans the rank filter as
    WindowGroupLimit, so only per-cluster leaders survive the exchange.
    """
    labeled = (
        docs.join(
            clusters.withColumnRenamed("id", id_col),
            on=id_col,
            how="left",
        )
        .withColumn("cluster", F.coalesce(F.col("cluster"), F.col(id_col)))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col(id_col).alias("keep_id"),
            quality_col,
        )
    )


# =============================================================================
# Bloom-filter membership pre-filter (dd13). The pattern behind Spark's
# own runtime bloom pruning (pinned as a plan demo in test_r5b_ops),
# re-built here as an EXPLICIT, deterministic operator so the filter
# itself is a first-class, oracle-checkable artifact: k=3 md5-derived
# bit positions in an m=4096-bit space, represented as the distinct
# position table (<= m rows — the broadcastable "bitmap"). Probing is a
# map-side broadcast join; the expensive exact-verify join runs ONLY on
# the bloom-positive candidates. One-sided error (no false negatives)
# and the classic (1-e^{-kn/m})^k false-positive behavior are pinned in
# pytest; the full corpus query dd13 value-checks every count against
# DuckDB recomputing the identical positions.
# =============================================================================


def _bloom_positions(col: Column, k: int = 3, m: int = 4096) -> Column:
    """Array of k bit positions for a key: _md5_bucket32(key, 'bloom{i}') % m."""
    return F.array(
        *[(_md5_bucket32(col, f"bloom{i}") % F.lit(m)).cast("int") for i in range(k)]
    )


def bloom_build(
    keys: DataFrame, key_col: str, k: int = 3, m: int = 4096
) -> DataFrame:
    """Build the filter from a key column: the DISTINCT set bit positions
    (one int column ``pos``). At most m rows regardless of input size —
    map-side partial distinct keeps the shuffle bounded by m per task."""
    return (
        keys.select(F.explode(_bloom_positions(F.col(key_col), k, m)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame, bloom: DataFrame, key_col: str, k: int = 3, m: int = 4096
) -> DataFrame:
    """Add ``bloom_hit`` to each probe row: true iff ALL k of the key's
    positions are set. The position table collapses to ONE row holding
    the sorted position array (<= m ints — the literal bitmap, a few KB)
    which broadcast-cross-joins onto the probe side; the membership test
    is then a pure map-side ``forall(array_contains)`` — the probe
    corpus is never shuffled or exploded at all."""
    bits = bloom.agg(F.sort_array(F.collect_set("pos")).alias("__bits"))
    probed = probes.crossJoin(F.broadcast(bits))
    hit = F.forall(
        _bloom_positions(F.col(key_col), k, m),
        lambda p: F.array_contains(F.col("__bits"), p),
    )
    return probed.withColumn("bloom_hit", hit).drop("__bits")


def bloom_prefilter_audit(
    build_docs: DataFrame,
    probe_docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """End-to-end cross-corpus membership audit: build a bloom over the
    build side's normalized-text fingerprints, probe the other corpus,
    exact-verify ONLY bloom-positive docs (semi-join on the fingerprint),
    and report the confusion counts per probe source:

      (source, n_probe, n_bloom_hits, n_true_dups, n_false_positives)

    The exact-verify join's left side is pre-shrunk by the bloom — at
    100 TB this is the difference between shuffling the whole probe
    corpus into the join and shuffling only the candidate sliver.
    No false negatives by construction (pinned in pytest), so
    n_true_dups is exact."""
    build_fps = build_docs.select(fingerprint(F.col(text_col)).alias("fp"))
    bloom = bloom_build(build_fps, "fp", k=k, m=m)
    probed = bloom_probe(
        probe_docs.withColumn("fp", fingerprint(F.col(text_col))), bloom, "fp", k=k, m=m
    )
    candidates = probed.where(F.col("bloom_hit"))
    verified = candidates.join(
        build_fps.distinct(), "fp", "left_semi"
    ).select(F.col("doc_id").alias("__vid"))
    flagged = probed.join(
        verified, probed["doc_id"] == verified["__vid"], "left"
    ).withColumn("true_dup", F.col("__vid").isNotNull())
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_probe"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("n_bloom_hits"),
        F.sum(F.when(F.col("true_dup"), 1).otherwise(0)).alias("n_true_dups"),
        F.sum(
            F.when(F.col("bloom_hit") & ~F.col("true_dup"), 1).otherwise(0)
        ).alias("n_false_positives"),
    )


def containment_on_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT for candidate pairs — the doc-in-doc
    detector Jaccard misses (Broder 1997's containment C(A,B) =
    |S(A) ∩ S(B)| / |S(A)|): a snippet wholly embedded in a larger
    document has containment ~1 while its Jaccard is only
    |A|/|B| — threshold on Jaccard alone and every quote, boilerplate
    wrap, or excerpt-with-commentary survives dedup.

    Emits BOTH metrics as half-up BIGINT e4 ratios
    ((x*10^4*2 + d) div (2*d) — the engine-exact integer recipe, no
    double division/round in the loop):
    ``containment_e4`` of A in B, and ``jaccard_e4`` for contrast.

    Same physical shape as ``jaccard_on_pairs``: the candidate-pair
    table (LSH-blocked at scale) joins per-doc shingle SETS twice;
    intersection via array functions, no explode past the shingle
    build."""
    sh = docs.select(
        F.col(id_col).alias("jid"), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col("jid").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("jid").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("__i"),
            F.size("sh_a").cast("long").alias("__na"),
            F.size("sh_b").cast("long").alias("__nb"),
        )
    )
    zero = F.lit(0).cast("long")
    return joined.select(
        "id_a",
        "id_b",
        F.when(
            F.col("__na") > 0,
            F.expr("(__i * 20000L + __na) div (2L * __na)"),
        ).otherwise(zero).alias("containment_e4"),
        F.when(
            F.col("__na") + F.col("__nb") - F.col("__i") > 0,
            F.expr(
                "(__i * 20000L + (__na + __nb - __i))"
                " div (2L * (__na + __nb - __i))"
            ),
        ).otherwise(zero).alias("jaccard_e4"),
    )
