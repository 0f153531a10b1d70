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


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    round_dp: int = 5,
    id_col: str | None = None,
) -> DataFrame:
    """Exact covariance matrix cells cov(i, j) for i <= j.

    cov(i,j) = E[x_i x_j] - E[x_i] E[x_j]  (population covariance).
    Elements are cast to double BEFORE multiplying so both engines do
    identical float->double arithmetic; output rounded for cross-engine
    hash comparison.

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
    with_id = df.select(
        row_key.alias("__rid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
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


def embedding_covariance_arrow(
    df: DataFrame, vec_col: str = "embedding", round_dp: int = 5
) -> DataFrame:
    """Scale form: per-partition numpy Gram partials, one tiny reduce.

    Emits the same (i, j, cov) upper-triangle cells as
    ``embedding_covariance``; the shuffle moves only
    ``num_partitions * d^2`` cells.
    """
    import numpy as np

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        sums = None
        count = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
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

    parts = df.select(vec_col).mapInPandas(
        partials, "i int, j int, sxy double, sx double, sy double, n long"
    )
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

    cells = embedding_covariance(
        df, vec_col, round_dp=12, id_col=id_col
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
