"""Unit tests for the functions/dedup.py DataFrame-level library."""

from __future__ import annotations


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different text about spark engines and parquet files"),
        (5, "another unrelated document mentioning minhash banding only"),
    ]
    return spark.createDataFrame(rows, "id long, body string")


def test_shingle_minhash_shape_and_determinism(spark):
    from polars_readstat_spark.functions.dedup import shingle_minhash

    sig = shingle_minhash(_docs(spark), "id", "body", k=4)
    assert sig.columns == ["id", "h0", "h1", "h2", "h3"]
    a = {r.id: (r.h0, r.h1, r.h2, r.h3) for r in sig.collect()}
    b = {r.id: (r.h0, r.h1, r.h2, r.h3) for r in sig.collect()}
    assert a == b
    assert a[1] == a[2]  # identical text -> identical signature
    assert a[1] != a[4]


def test_lsh_candidate_pairs_finds_dups(spark):
    from polars_readstat_spark.functions.dedup import (
        lsh_candidate_pairs,
        shingle_minhash,
    )

    sig = shingle_minhash(_docs(spark), "id", "body", k=8)
    pairs = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in lsh_candidate_pairs(sig, "id").collect()
    }
    assert pairs[(1, 2)] == 4  # exact dups share every band
    assert all(a < b for a, b in pairs)


def test_near_dup_components_both_algorithms(spark):
    from polars_readstat_spark.functions.dedup import near_dup_components

    for algo in ("propagate", "star"):
        out = {
            r.id: (r.component, r.is_keeper)
            for r in near_dup_components(
                _docs(spark), "id", "body", algorithm=algo
            ).collect()
        }
        assert len(out) == 5
        # exact dups grouped under min id with one keeper
        assert out[1] == (1, True)
        assert out[2][0] == 1 and out[2][1] is False
        # unrelated docs stay singletons
        assert out[4] == (4, True)
        assert out[5] == (5, True)
