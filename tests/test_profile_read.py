"""A3 profiled reads: phases sum to ~wall, counts match the real scan,
and options (projection, limits) shape the profiled work."""

from __future__ import annotations

import os

import pytest

CORPUS = "/root/reference/crates/polars_readstat_rs/tests/data"
DTA = "/root/reference/crates/polars_readstat_rs/tests/stata/data/sample.dta"
SAV = "/root/reference/crates/polars_readstat_rs/tests/spss/data/sample_large.sav"


def _has(p):
    return os.path.isfile(p)


@pytest.mark.skipif(not _has(DTA), reason="corpus missing")
def test_profile_phases_sum_to_wall():
    from polars_readstat_spark import profile_read

    prof = profile_read(DTA)
    phase_sum = (
        prof["metadata_s"] + prof["plan_s"] + prof["io_s"] + prof["decode_arrow_s"]
    )
    # decode_arrow_s clamps at 0 when IO dominates a cached tiny file,
    # so the sum can undershoot; it must never exceed wall by more
    # than scheduling noise
    assert phase_sum <= prof["total_s"] + 0.05
    assert prof["total_s"] < 30
    assert prof["n_rows"] > 0 and prof["n_batches"] >= 1
    assert prof["n_partitions"] >= 1
    assert prof["bytes_read"] == os.path.getsize(DTA)
    assert all(
        prof[k] >= 0
        for k in ("metadata_s", "plan_s", "io_s", "decode_arrow_s")
    )


@pytest.mark.skipif(not _has(DTA), reason="corpus missing")
def test_profile_matches_scan_rowcount(spark):
    import polars_readstat_spark as prs
    from polars_readstat_spark import profile_read

    prs.register(spark)
    expected = spark.read.format("readstat").load(DTA).count()
    assert profile_read(DTA)["n_rows"] == expected


@pytest.mark.skipif(not _has(SAV), reason="corpus missing")
def test_profile_respects_options():
    from polars_readstat_spark import profile_read

    full = profile_read(SAV)
    limited = profile_read(SAV, n_rows=10)
    assert limited["n_rows"] == 10 < full["n_rows"]
    one_col = profile_read(SAV, columns=full["columns"][0])
    assert one_col["columns"] == [full["columns"][0]]
    assert one_col["n_rows"] == full["n_rows"]
