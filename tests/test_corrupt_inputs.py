"""Corrupt-input behavior: garbage and truncated files fail fast with
informative errors at metadata-parse time (driver-side), never with
silent wrong data or executor-side surprises."""

from __future__ import annotations

import os

import pytest

CORPUS = "/root/reference/crates/polars_readstat_rs/tests"


def test_garbage_magic_rejected(tmp_path):
    from polars_readstat_spark.sources.dta.meta import parse_dta_meta
    from polars_readstat_spark.sources.sas7bdat.meta import parse_sas_meta
    from polars_readstat_spark.sources.sav.meta import parse_sav_meta

    g = tmp_path / "g.bin"
    g.write_bytes(b"\x99" * 512)
    with pytest.raises(ValueError):
        parse_dta_meta(str(g))
    with pytest.raises(ValueError):
        parse_sav_meta(str(g))
    with pytest.raises(ValueError):
        parse_sas_meta(str(g))


@pytest.mark.skipif(
    not os.path.isfile(f"{CORPUS}/stata/data/sample.dta"),
    reason="corpus missing",
)
def test_truncated_header_fails_fast(tmp_path):
    from polars_readstat_spark.sources.dta.meta import parse_dta_meta

    src = open(f"{CORPUS}/stata/data/sample.dta", "rb").read()
    t = tmp_path / "t.dta"
    t.write_bytes(src[:200])
    with pytest.raises((ValueError, EOFError)):
        parse_dta_meta(str(t))


def test_unknown_extension_rejected(spark):
    import polars_readstat_spark as prs

    prs.register(spark)
    with pytest.raises(Exception) as ei:
        spark.read.format("readstat").load("/tmp/nope.xyz").collect()
    assert "xyz" in str(ei.value) or "extension" in str(ei.value).lower() or "No such file" in str(ei.value)
