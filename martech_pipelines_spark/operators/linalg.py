"""Distributed linear algebra over embedding columns.

The missing piece between the similarity operators (top-k, ANN indexes in
``operators/similarity.py``) and model-side work: second-moment statistics
and PCA projection of an ``array<float>`` column (SURVEY.md §2.J extension
surface — dimensionality reduction is the standard pre-step before IVF /
quantization at 100-TB embedding scale).

Two formulations of the covariance matrix:

- ``embedding_covariance`` — exact, ORACLE-EXPRESSIBLE: posexplode each
  vector to (dim, value), self-join within the row key on i <= j, one
  keyed aggregation to d*(d+1)/2 upper-triangle cells.  O(n * d^2) rows
  through the shuffle — fine for the correctness corpus, wasteful at
  scale.
- ``embedding_covariance_arrow`` — the 100-TB form: ``mapInPandas``
  accumulates per-partition Gram matrices (numpy ``X.T @ X``) and emits
  ONE d*d partial per partition; a single tiny reduce sums them.  The
  shuffle carries (num_partitions * d^2) cells instead of (n * d^2).
  Pinned equal to the exact form in pytest.

Determinism contract (round-6 hardening): with the default
``quantize=6`` both forms quantize every embedding value to a scaled
64-bit integer ``floor(x * 10^6 + 0.5)`` and accumulate EXACT integer
moments (Σx, Σy, Σxy) in DECIMAL(38,0).  Integer addition is
associative, so every partitioning, engine, build, and summation order
produces bit-identical moment sums; the final rounded covariance is
then computed with pure integer half-up division, so the output
doubles are bit-identical across Spark and DuckDB.  Round 5's driver
hash-fail was exactly the non-quantized failure mode: double sums that
differ by ~1 ulp across environments landing ~3e-9 from a 5-dp
rounding boundary (VERDICT.md round 5, "What's wrong" #1).  Pass
``quantize=None`` for the legacy float path (fine for PCA, where the
eigensolve tolerates ~1e-7 input noise and no cross-engine hash is
taken).

``pca_project`` eigendecomposes the (tiny, driver-side) covariance with
numpy, fixes the eigenvector sign deterministically, and projects every
vector onto the top-k components as one codegen-friendly expression over
a broadcast literal matrix — no Python in the projection hot path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_cov_from_moments(
    moments: DataFrame,
    round_dp: int,
    quantize: int,
    as_scaled_int: bool = False,
) -> DataFrame:
    """(i, j, n, sxy, sx, sy) integer moments -> bit-deterministic cov.

    m = n*sxy - sx*sy is the covariance numerator at scale n^2 * 10^(2q);
    the rounded cell is round_half_up(m * 10^round_dp / (n^2 * 10^(2q)))
    computed entirely with integer `div` (truncating division on
    non-negative operands == floor), then one exact int->double cast and
    one IEEE division by 10^round_dp.  Every step is either associative
    integer arithmetic or a deterministic function of identical integers,
    so Spark and DuckDB produce bit-identical doubles.

    ``as_scaled_int=True`` returns the cell as the exact BIGINT
    ``cov * 10^round_dp`` instead of a double — for consumers that keep
    computing in integer space (e.g. the s18 drift distance, whose sum
    of squared cell differences stays exact that way).
    """
    nd = F.col("n").cast("decimal(38,0)")
    m = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).alias("m")
    den = (nd * nd * F.lit(10 ** (2 * quantize))).alias("den")
    scaled = moments.select(
        "i", "j", (m * F.lit(10 ** round_dp)).alias("num"), den
    )
    half_up = F.expr(
        "CASE WHEN num >= 0 THEN (2*num + den) div (2*den) "
        "ELSE -((-2*num + den) div (2*den)) END"
    )
    if as_scaled_int:
        return scaled.select("i", "j", half_up.alias("cov_scaled"))
    return scaled.select(
        "i",
        "j",
        (half_up.cast("double") / F.lit(float(10 ** round_dp))).alias("cov"),
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    round_dp: int = 5,
    id_col: str | None = None,
    quantize: int | None = 6,
    as_scaled_int: bool = False,
) -> DataFrame:
    """Exact covariance matrix cells cov(i, j) for i <= j.

    cov(i,j) = E[x_i x_j] - E[x_i] E[x_j]  (population covariance).
    With ``quantize=q`` (default 6), values are quantized to
    ``floor(x * 10^q + 0.5)`` BIGINTs and the moments are exact integer
    sums — bit-identical under any partitioning/engine (see module
    docstring).  ``quantize=None`` keeps the legacy double-sum path.

    ``id_col`` names an existing unique row key.  Pass one whenever the
    frame has it: the fallback ``monotonically_increasing_id`` is only
    positionally stable, and the within-row pairing self-joins two
    branches of the same projection — over a nondeterministically
    ordered upstream (round-robin repartition) independently recomputed
    ids would cross-pair values from DIFFERENT rows.  The fallback
    persists the id projection so both join branches read one
    materialization.
    """
    row_key = (
        F.col(id_col) if id_col is not None
        else F.monotonically_increasing_id()
    )
    if quantize is None:
        elem = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    else:
        # floor(x*10^q + 0.5): pure IEEE double ops + floor — the same
        # per-value function in both engines, no .5-tie round() ambiguity.
        scale = float(10 ** quantize)
        elem = F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)),
        )
    with_id = df.select(row_key.alias("__rid"), elem.alias("__v"))
    if id_col is None:
        with_id = with_id.persist()
    exploded = with_id.select(
        "__rid", F.posexplode("__v").alias("i", "xi")
    )
    # Within-row pairing: equi-join on the synthetic row id (keyed shuffle,
    # never cartesian), upper triangle only.
    a = exploded.select("__rid", "i", "xi")
    b = exploded.select(
        F.col("__rid").alias("__rid2"),
        F.col("i").alias("j"),
        F.col("xi").alias("xj"),
    )
    pairs = a.join(b, (a["__rid"] == b["__rid2"]) & (a["i"] <= b["j"]))
    if quantize is None:
        moments = pairs.groupBy("i", "j").agg(
            F.count("*").alias("n"),
            F.sum(F.col("xi") * F.col("xj")).alias("sxy"),
            F.sum("xi").alias("sx"),
            F.sum("xj").alias("sy"),
        )
        return moments.select(
            "i",
            "j",
            F.round(
                F.col("sxy") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                round_dp,
            ).alias("cov"),
        )
    return _exact_cov_from_moments(
        _exact_pair_moments(pairs), round_dp, quantize,
        as_scaled_int=as_scaled_int,
    )


def _exact_pair_moments(pairs: DataFrame) -> DataFrame:
    """(i, j, xi, xj) quantized pairs -> (i, j, n, sxy, sx, sy) exact
    integer moments.  Per-term products fit int64 (|xq| <= ~10^q *
    max|x|); sums are accumulated in DECIMAL(38,0) so no row count can
    overflow them.  These moment frames are MERGEABLE: integer sums are
    associative, so unioning per-batch moment frames and re-summing is
    bit-identical to one pass over the union (the IVM twin
    h19_incremental_covariance is exactly that merge)."""
    return pairs.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum((F.col("xi") * F.col("xj")).cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("xi").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("xj").cast("decimal(38,0)")).alias("sy"),
    )


def covariance_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int = 6,
) -> DataFrame:
    """The mergeable integer moment state for one batch of vectors —
    the incremental-covariance building block.  Same quantization and
    pairing as ``embedding_covariance``; a caller maintains the running
    state with ``merge_covariance_moments`` and renders cells with
    ``covariance_from_moments`` whenever needed."""
    scale = float(10 ** quantize)
    elem = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)),
    )
    exploded = df.select(F.col(id_col).alias("__rid"), elem.alias("__v")).select(
        "__rid", F.posexplode("__v").alias("i", "xi")
    )
    a = exploded.select("__rid", "i", "xi")
    b = exploded.select(
        F.col("__rid").alias("__rid2"),
        F.col("i").alias("j"),
        F.col("xi").alias("xj"),
    )
    pairs = a.join(b, (a["__rid"] == b["__rid2"]) & (a["i"] <= b["j"]))
    return _exact_pair_moments(pairs)


def merge_covariance_moments(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a new batch's moment frame into the running state: one keyed
    sum over (i, j).  Exact-integer associativity makes the merged state
    bit-identical to a full recompute — the delta-only shuffle carries
    d*(d+1)/2 cells per batch, independent of batch row count."""
    return (
        state.unionByName(delta)
        .groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sxy").alias("sxy"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
        )
    )


def covariance_from_moments(
    moments: DataFrame, round_dp: int = 5, quantize: int = 6
) -> DataFrame:
    """Render (i, j, cov) cells from a (possibly merged) moment frame."""
    return _exact_cov_from_moments(moments, round_dp, quantize)


def embedding_label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_dp: int = 6,
    quantize: int = 6,
) -> DataFrame:
    """Per-label mean vector as (label, dim, centroid) cells — the
    class-conditional first-moment statistics behind nearest-centroid
    classification, per-class drift monitors and LDA-style whitening.

    Same integer-exact contract as ``embedding_covariance``: quantized
    BIGINT sums in DECIMAL(38,0), integer half-up division — the output
    doubles are bit-identical under any partitioning or engine.  One
    keyed shuffle of n*d (label, dim) cells; output is labels*d rows
    (catalog-bound, row-count independent)."""
    scale = float(10 ** quantize)
    elem = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)),
    )
    cells = df.select(F.col(label_col).alias("label"), elem.alias("__v")).select(
        "label", F.posexplode("__v").alias("dim", "xq")
    )
    agg = cells.groupBy("label", "dim").agg(
        F.count("*").alias("n"),
        F.sum(F.col("xq").cast("decimal(38,0)")).alias("sx"),
    )
    num = (F.col("sx") * F.lit(10 ** round_dp)).alias("num")
    den = (F.col("n").cast("decimal(38,0)") * F.lit(10 ** quantize)).alias("den")
    scaled = agg.select("label", "dim", num, den)
    half_up = F.expr(
        "CASE WHEN num >= 0 THEN (2*num + den) div (2*den) "
        "ELSE -((-2*num + den) div (2*den)) END"
    )
    return scaled.select(
        "label",
        "dim",
        (half_up.cast("double") / F.lit(float(10 ** round_dp))).alias("centroid"),
    )


def embedding_covariance_arrow(
    df: DataFrame,
    vec_col: str = "embedding",
    round_dp: int = 5,
    quantize: int | None = 6,
) -> DataFrame:
    """Scale form: per-partition numpy Gram partials, one tiny reduce.

    Emits the same (i, j, cov) upper-triangle cells as
    ``embedding_covariance``; the shuffle moves only
    ``num_partitions * d^2`` cells.

    With ``quantize=q`` (default) the kernel quantizes to int64 and the
    per-partition Gram matmul runs in int64 — exact, so the reduce-side
    DECIMAL(38,0) sums are bit-identical to the exact form's no matter
    how rows land in partitions.  int64 partial headroom: a partial
    overflows only past ~9e18 / (10^2q * max|x|^2) rows per partition
    (~9M rows at q=6, |x|<=1) — for d=64 float32 vectors that is a
    ~2.3 GB partition, far above any sane ``maxPartitionBytes``.
    """
    import numpy as np

    _INT64_MAX = 2**63 - 1

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        sums = None
        count = 0
        max_abs = 0  # running max |quantized element|, exact Python int
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            if quantize is not None:
                x = np.floor(x * float(10 ** quantize) + 0.5).astype("int64")
                # Overflow guard (ADVICE r6): numpy int64 matmul WRAPS
                # silently.  Every Gram cell (and any prefix partial sum
                # of it) is bounded by max|xq|^2 * rows-so-far, so if
                # that bound fits int64 nothing wrapped.  The documented
                # ~9e6-rows headroom assumed |x|<=1 — this check makes
                # out-of-envelope data fail loudly instead of silently
                # corrupting the "bit-exact" contract.
                max_abs = max(max_abs, int(np.abs(x).max()))
                if max_abs * max_abs * (count + len(pdf)) > _INT64_MAX:
                    raise OverflowError(
                        "embedding_covariance_arrow: int64 Gram partial "
                        f"would overflow (max|xq|={max_abs}, rows="
                        f"{count + len(pdf)}, quantize={quantize}). "
                        "Lower `quantize`, shrink partitions, or use the "
                        "exact DECIMAL form embedding_covariance()."
                    )
            g = x.T @ x
            gram = g if gram is None else gram + g
            s = x.sum(axis=0)
            sums = s if sums is None else sums + s
            count += len(pdf)
        if gram is None:
            return
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu.astype("int32"),
                "j": ju.astype("int32"),
                "sxy": gram[iu, ju],
                "sx": sums[iu],
                "sy": sums[ju],
                "n": np.full(len(iu), count, dtype="int64"),
            }
        )

    kind = "double" if quantize is None else "long"
    parts = df.select(vec_col).mapInPandas(
        partials, f"i int, j int, sxy {kind}, sx {kind}, sy {kind}, n long"
    )
    if quantize is None:
        agg = parts.groupBy("i", "j").agg(
            F.sum("sxy").alias("sxy"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("n").alias("n"),
        )
        return agg.select(
            "i",
            "j",
            F.round(
                F.col("sxy") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                round_dp,
            ).alias("cov"),
        )
    agg = parts.groupBy("i", "j").agg(
        F.sum(F.col("sxy").cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("sx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("sy").cast("decimal(38,0)")).alias("sy"),
        F.sum("n").alias("n"),
    )
    return _exact_cov_from_moments(agg, round_dp, quantize)


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
    id_col: str | None = None,
) -> tuple["object", "object", "object"]:
    """Driver-side eigendecomposition of the exact covariance.

    Returns (mean vector, components [k x d], explained_variance [k]) as
    numpy arrays.  The collect is d*(d+1)/2 cells + d means — tiny and
    independent of row count.  Sign convention: each component's
    largest-magnitude coordinate is made positive, so the decomposition
    is deterministic across runs/platforms up to eigenvalue ties.
    """
    import numpy as np

    # Float path (quantize=None): PCA wants full double fidelity, and no
    # cross-engine hash is taken on the eigensolve inputs.
    cells = embedding_covariance(
        df, vec_col, round_dp=12, id_col=id_col, quantize=None
    ).collect()
    d = max(r["j"] for r in cells) + 1
    cov = np.zeros((d, d))
    for r in cells:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    mean_row = df.select(
        F.array(*[
            F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
            for i in range(d)
        ]).alias("m")
    ).first()
    mean = np.array(mean_row["m"])
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    for r in range(comps.shape[0]):
        lead = np.argmax(np.abs(comps[r]))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    return mean, comps, vals[order]


def pca_project(
    df: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    out_col: str = "pca",
    round_dp: int = 4,
) -> DataFrame:
    """Project vectors onto precomputed components: (x - mean) @ C^T.

    The components are broadcast as literal arrays and the dot products
    run as ``F.aggregate``/``F.zip_with`` codegen expressions — zero
    Python in the per-row path.
    """
    d = len(mean)
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        mean_lit,
        lambda x, m: x - m,
    )
    projections = [
        F.round(
            F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(c)) for c in comp]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            round_dp,
        )
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*projections))


def power_iteration_det(
    cells_scaled: DataFrame,
    rounds: int = 3,
    cell_dp: int = 6,
    v0: int = 10_000_000_000,
) -> DataFrame:
    """Fixed-iteration deterministic power iteration over the exact
    integer covariance — the value-checkable twin of the eigensolve
    hiding inside ``s13_pca_project`` (VERDICT r10 #4, the s2j/t14c
    unrolled-iteration discipline applied to PCA): v_{t+1} =
    round_half_up((C_scaled @ v_t) / 10^cell_dp), all BIGINT, starting
    from the all-``v0`` vector.  Every step is an associative integer
    sum or a half-up division of identical integers, so the iterates
    are bit-identical across engines — unlike ``numpy.linalg.eigh``,
    whose LAPACK output is platform-trained state.

    ``cells_scaled``: (i, j, cov_scaled) upper-triangle cells with
    ``cov_scaled = cov * 10^cell_dp`` exact BIGINTs (from
    ``embedding_covariance(..., as_scaled_int=True)``).

    Overflow bound: |v_{t+1}| <= d * max|cov| * |v_t|; with d = 64,
    max|cov| < 1 and v0 = 1e10, three rounds stay under ~1e16 —
    comfortably BIGINT (sums still accumulate in DECIMAL(38,0)).

    Returns one row per dimension: (dim, v1, v2, v3[, ...]) — the
    unrolled iterates.  Scale shape: the only data-sized stage is the
    upstream covariance reduce; the iteration itself runs keyed joins
    over the d^2-cell matrix (constant in corpus size)."""
    c0 = cells_scaled.select(
        "i", "j", F.col("cov_scaled").cast("long").alias("c")
    )
    full = c0.unionByName(
        c0.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )
    den = 10 ** cell_dp
    half_up = F.expr(
        f"CASE WHEN w >= 0 THEN (2*w + {den}) div (2*{den}) "
        f"ELSE -((-2*w + {den}) div (2*{den})) END"
    ).cast("long")
    v = full.select(F.col("i").alias("dim")).distinct().select(
        "dim", F.lit(v0).cast("long").alias("v")
    )
    iterates = []
    for t in range(1, rounds + 1):
        w = (
            full.join(v, full["j"] == v["dim"])
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("c").cast("decimal(38,0)") * F.col("v")
                ).alias("w")
            )
        )
        v = w.select(F.col("i").alias("dim"), half_up.alias("v"))
        iterates.append(v.select("dim", F.col("v").alias(f"v{t}")))
    out = iterates[0]
    for nxt in iterates[1:]:
        out = out.join(nxt, "dim")
    return out.select("dim", *[f"v{t}" for t in range(1, rounds + 1)])


def covariance_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 5,
    quantize: int = 6,
) -> DataFrame:
    """Embedding-distribution drift between two populations: the
    Frobenius distance between their covariance matrices, plus the
    worst-drifting cell — the monitor that tells a training pipeline
    "this week's crawl no longer looks like the corpus the model was
    tuned on" BEFORE any model is run.

    Fully integer-exact: each population's cells come out of
    ``_exact_cov_from_moments`` as exact BIGINT ``cov * 10^round_dp``;
    cell differences and their squared sum stay in integer space
    (DECIMAL(38,0)), so the reported distance is bit-identical across
    engines and partitionings — a drift monitor whose own numbers
    drift would page people for nothing.

    Output (1 row): n_cells, frob2 (sum of squared cell differences),
    max_abs_diff, worst_i, worst_j.  Shuffles: one keyed moment
    aggregation per side (d*(d+1)/2 cells each) + one tiny cell join.
    """
    a = _exact_cov_from_moments(
        covariance_moments(df_a, vec_col, id_col, quantize),
        round_dp, quantize, as_scaled_int=True,
    ).withColumnRenamed("cov_scaled", "ca")
    b = _exact_cov_from_moments(
        covariance_moments(df_b, vec_col, id_col, quantize),
        round_dp, quantize, as_scaled_int=True,
    ).withColumnRenamed("cov_scaled", "cb")
    cells = a.join(b, ["i", "j"]).select(
        "i", "j", (F.col("ca") - F.col("cb")).alias("d")
    )
    scale2 = float(10 ** (2 * round_dp))
    scale1 = float(10 ** round_dp)
    # deterministic worst cell: max (|d|, then smallest (i, j)) via one
    # max_by over a fully-ordered struct — no ties possible
    worst = F.max(
        F.struct(
            F.abs(F.col("d")).alias("ad"),
            (-F.col("i")).alias("ni"),
            (-F.col("j")).alias("nj"),
        )
    )
    return cells.agg(
        F.count("*").alias("n_cells"),
        (
            F.sum((F.col("d") * F.col("d")).cast("decimal(38,0)"))
            .cast("double") / F.lit(scale2)
        ).alias("frob2"),
        (worst.getField("ad").cast("double") / F.lit(scale1)).alias(
            "max_abs_diff"
        ),
        (-worst.getField("ni")).alias("worst_i"),
        (-worst.getField("nj")).alias("worst_j"),
    )
