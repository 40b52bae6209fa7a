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


def test_simhash_bits_properties(spark):
    from polars_readstat_spark.functions.dedup import simhash_bits

    sim = {
        r.id: r.simhash
        for r in simhash_bits(_docs(spark), "id", "body", bits=16).collect()
    }
    assert all(len(s) == 16 and set(s) <= {"0", "1"} for s in sim.values())
    assert sim[1] == sim[2]  # identical text -> identical fingerprint
    ham13 = sum(a != b for a, b in zip(sim[1], sim[3]))
    ham14 = sum(a != b for a, b in zip(sim[1], sim[4]))
    assert ham13 < ham14  # one-token edit closer than unrelated text


def test_simhash_candidate_pairs_pigeonhole_recall(spark):
    """Every pair within hamming < bands must be emitted, with the
    exact hamming distance attached."""
    from pyspark.sql import Row

    from polars_readstat_spark.functions.dedup import (
        simhash_candidate_pairs,
    )

    rows = [
        Row(id=1, simhash="0000000011111111"),
        Row(id=2, simhash="0000000011111110"),  # hamming 1 vs id=1
        Row(id=3, simhash="0000000011110000"),  # hamming 4 vs id=1
        Row(id=4, simhash="1111111100000000"),  # far from everything
    ]
    sim = spark.createDataFrame(rows)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_candidate_pairs(
            sim, "id", bits=16, bands=2, max_hamming=4
        ).collect()
    }
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 4  # shares the first band, within threshold
    assert (1, 4) not in got and (2, 4) not in got

    tight = {
        (r.id_a, r.id_b)
        for r in simhash_candidate_pairs(
            sim, "id", bits=16, bands=2, max_hamming=1
        ).collect()
    }
    assert tight == {(1, 2)}


def test_simhash_wide_fingerprint_and_sizing(spark):
    """Fingerprints wider than one MD5 digest (salted chunks) and the
    corpus-scale sizing helper."""
    from polars_readstat_spark.functions.dedup import (
        recommended_simhash,
        simhash_bits,
    )

    sim = {
        r.id: r.simhash
        for r in simhash_bits(_docs(spark), "id", "body", bits=72).collect()
    }
    assert all(len(s) == 72 and set(s) <= {"0", "1"} for s in sim.values())
    assert sim[1] == sim[2]
    # chunk 2 (bits 64..71) must not simply repeat chunk 0's prefix
    assert any(s[:8] != s[64:72] for s in sim.values())

    cfg = recommended_simhash(1_000_000_000, max_hamming=2)
    assert cfg["bands"] == 3
    assert cfg["bits"] == cfg["bands"] * 24  # log2(1e9/64) ~ 23.9 -> 24
    small = recommended_simhash(5000)
    assert small["bits"] % small["bands"] == 0
