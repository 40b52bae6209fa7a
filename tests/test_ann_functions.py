"""Unit tests for functions/ann.py against a numpy reference."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    # plant two near-duplicate pairs for the LSH path to find
    vecs[101] = vecs[1] + rng.normal(scale=0.01, size=16).astype(np.float32)
    vecs[102] = vecs[2] + rng.normal(scale=0.01, size=16).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vid long, emb array<float>")
    return df, vecs


def _numpy_topk(vecs, probe_ids, k):
    v = vecs.astype(np.float64)
    nrm = np.linalg.norm(v, axis=1)
    out = {}
    for q in probe_ids:
        cos = (v @ v[q]) / (nrm * nrm[q])
        order = sorted(
            (i for i in range(len(v)) if i != q),
            key=lambda i: (-cos[i], i),
        )
        out[q] = [(i, cos[i]) for i in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, corpus):
    from polars_readstat_spark.functions.ann import cosine_topk

    df, vecs = corpus
    probes = df.filter("vid < 5")
    got = cosine_topk(df, probes, "vid", "emb", k=3).collect()
    want = _numpy_topk(vecs, range(5), 3)
    by_q: dict = {}
    for r in sorted(got, key=lambda r: (r.q_id, r.rk)):
        by_q.setdefault(r.q_id, []).append((r.c_id, r.cosine))
    assert set(by_q) == set(range(5))
    for q in range(5):
        for (gi, gc), (wi, wc) in zip(by_q[q], want[q]):
            assert gi == wi
            assert gc == pytest.approx(wc, rel=1e-9)


def test_cosine_topk_lsh_finds_planted_duplicates(spark, corpus):
    from polars_readstat_spark.functions.ann import cosine_topk_lsh

    df, _ = corpus
    probes = df.filter("vid IN (1, 2)")
    got = cosine_topk_lsh(
        df, probes, "vid", "emb", k=3, planes=16, bands=8
    ).collect()
    top1 = {r.q_id: r.c_id for r in got if r.rk == 1}
    # near-identical vectors agree on nearly every hyperplane sign, so
    # 8 bands of 2 bits recall them with near-certainty
    assert top1.get(1) == 101
    assert top1.get(2) == 102


def test_cosine_topk_broadcasts_probes(spark, corpus):
    import contextlib
    import io

    from polars_readstat_spark.functions.ann import cosine_topk

    df, _ = corpus
    plan_df = cosine_topk(df, df.filter("vid = 0"), "vid", "emb", k=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan


def test_ivf_build_and_search(spark):
    """IVF index from the Lloyd fit + pruned search: results must
    match exact brute-force top-k whenever the probe's true neighbors
    live in the probed lists (guaranteed here by tight blobs)."""
    import numpy as np

    from polars_readstat_spark.functions.ann import (
        cosine_topk,
        cosine_topk_ivf,
        ivf_build,
    )

    rng = np.random.default_rng(3)
    centers = rng.normal(0, 1, (4, 8))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for c in centers:
        for _ in range(25):
            v = c + rng.normal(0, 0.02, 8)
            pts.append(v / np.linalg.norm(v))
    # interleave so the deterministic first-k init spans the blobs
    order = [b * 25 + i for i in range(25) for b in range(4)]
    rows = [
        (rank, [float(x) for x in pts[p]]) for rank, p in enumerate(order)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(3)

    assignments, cents = ivf_build(
        corpus, "vec_id", "embedding", n_lists=4, kmeans_iters=8
    )
    probes = corpus.filter("vec_id % 10 = 0")
    got = cosine_topk_ivf(
        corpus, probes, "vec_id", "embedding", assignments, cents,
        k=3, nprobe=2,
    )
    exact = cosine_topk(corpus, probes, "vec_id", "embedding", k=3)
    g = {(r.q_id, r.rk): r.c_id for r in got.collect()}
    e = {(r.q_id, r.rk): r.c_id for r in exact.collect()}
    assert g == e


def test_recall_floor_tripwire_raises_on_collapse(spark):
    """The _recall_floor guard must turn a param collapse into a hard
    error (VERDICT r07 next#8), and pass the measured value through
    untouched when the floor holds."""
    import pytest
    from pyspark.sql import functions as F
    from polars_readstat_spark.queries.similarity import _recall_floor

    one = spark.range(1).select(F.lit(0.12).alias("r"))
    ok = one.select(_recall_floor(F.col("r"), 0.08).alias("recall"))
    assert ok.collect()[0]["recall"] == 0.12
    bad = one.select(_recall_floor(F.col("r"), 0.5).alias("recall"))
    with pytest.raises(Exception, match="recall floor"):
        bad.collect()
