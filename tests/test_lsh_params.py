"""LSH parameterization: (planes, bands) flow through band
construction, recommended_lsh sizes band width to corpus scale, and
the bucket-cap diagnostic warns on oversized buckets."""

from __future__ import annotations

import warnings

import pytest

from polars_readstat_spark.functions.similarity import (
    band_bucket_check,
    lsh_bands_stack,
    lsh_coef_rows,
    recommended_lsh,
)


def test_recommended_lsh_scales_with_corpus():
    assert recommended_lsh(2_000) == (32, 4)       # small: 8-bit floor
    p, b = recommended_lsh(10**6)
    assert p // b == 14                            # log2(1e6/64) ~ 13.9
    p, b = recommended_lsh(10**9)
    assert p // b == 24                            # capped
    assert recommended_lsh(10**12)[0] // 4 == 24   # cap holds


def test_coef_rows_width_follows_planes():
    rows = lsh_coef_rows(64)
    assert len(rows) == 64 and len(rows[0]) == 65  # d + 64 coefs


def test_bands_stack_shape():
    s = lsh_bands_stack(64, 4)
    assert s.count("CASE WHEN") == 64 and "stack(4" in s


def test_band_construction_param_flow(spark):
    from pyspark.sql import functions as F

    from polars_readstat_spark.queries.similarity import _lsh_bands

    e = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), "
            "d -> cast(pmod(id * 31 + d * 7, 97) as float) / 97.0 - 0.5)"
        ).alias("embedding"),
    )
    bands = _lsh_bands(e, planes=64, bands=4).collect()
    assert len(bands) == 50 * 4
    assert all(len(r.band_key) == 16 for r in bands)  # 16-bit keys

    # diagnostic: low cap triggers the warning, generous cap does not
    bdf = _lsh_bands(e, planes=64, bands=4)
    with pytest.warns(RuntimeWarning, match="band bucket"):
        band_bucket_check(bdf, cap=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mx, nb = band_bucket_check(bdf, cap=10**6)
    assert mx >= 1 and nb >= 1


def test_scoped_persist_bounds_cached_tables(spark):
    from polars_readstat_spark.queries import _cache

    _cache.release_all()
    dfs = [spark.range(i + 1) for i in range(4)]
    for df in dfs:
        _cache.scoped_persist(df, keep=2)
    assert len(_cache._persisted) == 2
    assert dfs[0].storageLevel.useMemory is False  # evicted
    assert dfs[3].storageLevel.useMemory is True
    _cache.release_all()
    assert all(df.storageLevel.useMemory is False for df in dfs)
