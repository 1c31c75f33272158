"""Distributed covariance / PCA via sufficient statistics.

The whole family reduces an embedding corpus to (n, Σx, ΣxxT) — one
map-side-combinable pass — and derives everything else from those
moments:

- :func:`embedding_covariance` keeps the moments as EXACT decimals
  (order-independent sums, so a DuckDB oracle can reproduce the hash
  bit-for-bit) for a caller-chosen dim slice;
- :func:`pca_fit` computes the full d×d Gram with numpy partials inside
  ``mapInPandas`` (one partial row per Arrow batch — the standard
  "sufficient statistics up, k×d model down" coordinator pattern also
  used by :func:`similarity.kmeans_centroids`), then eigendecomposes the
  d×d covariance on the driver — d is model-scale (64 here), never
  corpus-scale;
- :func:`pca_project` broadcasts the k×d components as literals and
  scores rows JVM-side with ``zip_with``/``aggregate`` folds — no Python
  in the projection hot path.

100 TB: the only data-scale pass is the moment aggregation, which
partial-aggregates per partition (decimal path) or per Arrow batch
(numpy path) before anything shuffles; what crosses the wire is
O(partitions × d²) doubles, and what the driver ever holds is O(d²).
Eigh on a 64×64 (even 4096×4096) matrix is sub-second driver math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(emb: DataFrame, dims: int = 8,
                         vec_col: str = "embedding",
                         scale: int = 8) -> DataFrame:
    """Upper-triangle sample covariance of the first ``dims`` vector
    components, oracle-exact: each component is cast float→double→
    DECIMAL(12,scale) (a float can never land on a decimal rounding
    tie — an exact half at digit ``scale+1`` is non-dyadic — so the
    cast is engine-agnostic), the moment sums are exact decimals, and
    the single double formula ``(pij - si*sj/n)/(n-1)`` is written with
    the same association the oracle uses. One groupBy-less aggregate:
    map-side partials, a 1-row result, then a literal struct explode —
    no per-pair shuffle of row data."""
    v = F.col(vec_col).cast("array<double>")
    dec = f"decimal(12,{scale})"
    base = emb.select(*[F.element_at(v, i + 1).cast(dec).alias(f"x{i}")
                        for i in range(dims)])
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(f"x{i}").alias(f"s{i}") for i in range(dims)]
    aggs += [F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"p{i}_{j}")
             for i in range(dims) for j in range(i, dims)]
    g = base.agg(*aggs)
    n = F.col("n").cast("double")
    cell = [F.struct(
        F.lit(i).alias("dim_i"), F.lit(j).alias("dim_j"),
        F.round((F.col(f"p{i}_{j}").cast("double")
                 - F.col(f"s{i}").cast("double")
                 * F.col(f"s{j}").cast("double") / n)
                / (n - F.lit(1.0)), 6).alias("cov"))
        for i in range(dims) for j in range(i, dims)]
    return (g.select("n", F.explode(F.array(*cell)).alias("c"))
            .select(F.col("c.dim_i"), F.col("c.dim_j"),
                    F.col("n"), F.col("c.cov")))


def pca_fit(emb: DataFrame, k: int = 4,
            vec_col: str = "embedding") -> dict:
    """Fit a PCA model: numpy partial moments per Arrow batch, driver
    reduce + eigh. Returns ``{"n", "mean", "components", \
    "explained_variance"}`` with components sign-fixed (largest-|.|
    coordinate positive) and sorted by descending eigenvalue so the
    model is deterministic up to exactly-tied eigenvalues.

    The collect is bounded: one (n, d, d²) row per Arrow batch — model
    partials, not data (same license as the kmeans centroid collect).
    """
    import numpy as np
    import pandas as pd

    schema = "n long, s array<double>, g array<double>"

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            yield pd.DataFrame({"n": [m.shape[0]],
                                "s": [m.sum(axis=0).tolist()],
                                "g": [(m.T @ m).ravel().tolist()]})

    rows = emb.select(vec_col).mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    gram = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = (gram - np.outer(s, s) / n) / (n - 1)
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = vecs[:, order].T
    # sign convention: the largest-|.| coordinate of each component is
    # positive (eigh's sign is arbitrary; ties broken by first index)
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1.0
    return {"n": int(n), "mean": mean, "components": comps,
            "explained_variance": w[order]}


def pca_project(emb: DataFrame, model: dict, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Project rows onto the fitted components: k literal zip_with/
    aggregate dot products over the mean-centered vector, entirely
    JVM-side (whole-stage codegen, no Python). Output:
    (id, pc0..pc{k-1})."""
    from ..functions.vectors import as_double
    mean = [float(x) for x in model["mean"]]
    centered = F.zip_with(as_double(F.col(vec_col)),
                          F.array(*[F.lit(m) for m in mean]),
                          lambda x, m: x - m)
    cols = [F.col(id_col)]
    for ci, comp in enumerate(model["components"]):
        lit = F.array(*[F.lit(float(x)) for x in comp])
        score = F.aggregate(F.zip_with(centered, lit, lambda x, c: x * c),
                            F.lit(0.0), lambda acc, t: acc + t)
        cols.append(score.alias(f"pc{ci}"))
    return emb.select(*cols)
