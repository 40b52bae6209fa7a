"""functions/kmeans.py — iterative Lloyd fit against a numpy replica."""

from __future__ import annotations

import numpy as np
import pytest


def _blobs(rng, centers, n_per, spread=0.05):
    pts = []
    for ci, c in enumerate(centers):
        pts.append(c + rng.normal(0, spread, (n_per, len(c))))
    return np.concatenate(pts)


def _numpy_lloyd(X, centroids, iters):
    C = np.array(centroids, dtype=float)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for ci in range(len(C)):
            m = X[a == ci]
            if len(m):
                C[ci] = m.mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), C


def test_kmeans_recovers_blobs(spark):
    from polars_readstat_spark.functions.kmeans import kmeans_fit

    rng = np.random.default_rng(11)
    centers = np.array([[0.0, 0.0, 0.0], [5.0, 5.0, 0.0], [0.0, 5.0, 5.0]])
    X = _blobs(rng, centers, 60)
    # interleave ids across blobs so the deterministic first-k init
    # starts with one point per blob (init quality is the caller's
    # lever; Lloyd itself cannot escape a one-blob init)
    order = [b * 60 + i for i in range(60) for b in range(3)]
    rows = [(rank, [float(x) for x in X[pt]]) for rank, pt in enumerate(order)]
    df = spark.createDataFrame(rows, "id long, v array<double>").repartition(4)

    assigned, cents, iters = kmeans_fit(df, "id", "v", k=3, max_iters=15)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    assert iters >= 2
    # every blob lands in exactly one cluster, blobs don't mix
    blob_of_rank = {rank: pt // 60 for rank, pt in enumerate(order)}
    labels = [
        {got[rank] for rank, b in blob_of_rank.items() if b == blob}
        for blob in range(3)
    ]
    assert all(len(s) == 1 for s in labels)
    assert len(set().union(*labels)) == 3
    # converged centroids sit on the true centers (spread 0.05)
    recovered = sorted(np.round(c).tolist() for c in cents)
    assert recovered == sorted(centers.tolist())


def test_kmeans_matches_numpy_replica(spark):
    """Same deterministic init + iteration count ⇒ same assignments
    as a dense numpy Lloyd (centroid floats compared with tolerance:
    Spark averages in partition order)."""
    from polars_readstat_spark.functions.kmeans import kmeans_fit

    rng = np.random.default_rng(7)
    X = rng.normal(0, 1, (120, 4))
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "id long, v array<double>").repartition(3)

    assigned, cents, iters = kmeans_fit(
        df, "id", "v", k=4, max_iters=5, tol=0.0
    )
    ref_assign, ref_c = _numpy_lloyd(X, X[:4], iters)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    mismatches = sum(got[i] != ref_assign[i] for i in range(len(X)))
    assert mismatches == 0
    assert np.allclose(np.array(cents), ref_c, atol=1e-9)


def test_kmeans_guards(spark):
    from polars_readstat_spark.functions.kmeans import kmeans_fit

    df = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="fewer than k"):
        kmeans_fit(df, "id", "v", k=5)
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit(df, "id", "v", k=0)
