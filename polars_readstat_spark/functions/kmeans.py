"""Distributed Lloyd k-means over an embedding column.

The registry's ``kmeans_update_step`` verifies one exact update under
the DuckDB oracle; this is the full iterative fit a pipeline actually
runs (IVF index build, semantic-dedup clustering, corpus bucketing).

Scale shape per iteration:
- assignment is a map-only pass: the k×dim centroid matrix is tiny,
  so it ships as literal array expressions (k ``zip_with`` squared-L2
  reductions per row, all inside codegen) — no join, no shuffle;
- the update is one explode + map-side-combined average keyed by
  (cluster, dim): the shuffle carries k·dim rows regardless of corpus
  size;
- only the k×dim centroid matrix and the per-centroid movement ever
  reach the driver, so iterations are O(k·dim) on the driver and one
  linear pass on the cluster.

Initialization is deterministic (first k rows by id order), so runs
are reproducible without RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2_expr(vec_col: str, centroid: list[float]):
    """Squared L2 distance to one literal centroid, fully in codegen."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """df + a `cluster` column: index of the nearest centroid
    (squared L2; ties break to the lowest index). Map-only."""
    dists = F.array(*[_dist2_expr(vec_col, c) for c in centroids])
    return df.withColumn(
        "cluster",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_iters: int = 10,
    tol: float = 1e-6,
) -> tuple[DataFrame, list[list[float]], int]:
    """Lloyd iterations until centroid movement ≤ tol or max_iters.

    Returns (assignments, centroids, n_iters): ``assignments`` is the
    lazy (id, cluster) DataFrame under the final centroids;
    ``centroids`` is the k×dim list. Empty clusters keep their
    previous centroid (the standard Lloyd fallback)."""
    if k < 1:
        raise ValueError("kmeans_fit: k must be >= 1")
    init = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"kmeans_fit: corpus has fewer than k={k} rows")
    centroids = [[float(x) for x in r[0]] for r in init]
    src = df.select(id_col, vec_col)
    iters = 0
    for iters in range(1, max_iters + 1):
        assigned = assign_clusters(src, vec_col, centroids)
        means = (
            assigned.select(
                "cluster", F.posexplode(vec_col).alias("d", "x")
            )
            .groupBy("cluster", "d")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["d"]] = r["m"]
        for ci, dims in by_cluster.items():
            for d, m in dims.items():
                new[ci][d] = m
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, nw))
            for old, nw in zip(centroids, new)
        )
        centroids = new
        if shift <= tol * tol:
            break
    return (
        assign_clusters(src, vec_col, centroids).select(id_col, "cluster"),
        centroids,
        iters,
    )
