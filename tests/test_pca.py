"""Power-iteration PCA: the distributed covariance-free loop converges
to numpy's dominant eigenvector on the same data."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    from polars_readstat_spark.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = df.select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return df, X


def test_top_component_matches_numpy_uncentered(spark, emb):
    from polars_readstat_spark.functions.pca import top_component

    df, X = emb
    v, lam = top_component(df, X.shape[1], iters=40)
    G = X.T @ X
    w, V = np.linalg.eigh(G)
    ref_v, ref_l = V[:, -1], w[-1]
    got = np.array(v)
    cos = abs(float(got @ ref_v) / (np.linalg.norm(got) or 1.0))
    # eigengap here is thin (l2/l1 = 0.93), so 40 iterations buy
    # cos ~0.9999; Rayleigh converges quadratically and is tighter
    assert cos > 0.999, cos
    assert abs(lam - ref_l) / ref_l < 1e-3


def test_top_component_centered(spark, emb):
    from polars_readstat_spark.functions.pca import top_component

    df, X = emb
    Xc = X - X.mean(axis=0)
    v, lam = top_component(df, X.shape[1], iters=40, center=True)
    G = Xc.T @ Xc
    w, V = np.linalg.eigh(G)
    got = np.array(v)
    cos = abs(float(got @ V[:, -1]) / (np.linalg.norm(got) or 1.0))
    assert cos > 0.999, cos
    assert abs(lam - w[-1]) / w[-1] < 1e-2
