"""Informative-null scan modes (M2-M5, reference src/lib.rs:80-378 and
tests/test_informative_nulls.py model): Stata tagged missings .a-.z
and SPSS declared missing values/ranges surfaced as separate
indicator columns, structs, or merged strings."""

from __future__ import annotations

import os

import pytest

DTA = "/root/reference/crates/polars_readstat_rs/tests/stata/data/missing_test.dta"
SAV = "/root/reference/crates/polars_readstat_rs/tests/spss/data/sample_missing.sav"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(DTA), reason="reference corpus not present"
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


def _scan(spark, path, **kw):
    import polars_readstat_spark as prs

    return prs.scan_readstat(spark, path, **kw)


def test_baseline_has_no_indicators(spark):
    df = _scan(spark, DTA)
    assert not [c for c in df.columns if c.endswith("_null")]


def test_separate_mode_stata_tags(spark):
    df = _scan(spark, DTA, informative_nulls="separate")
    row = df.collect()[0]
    # missing_test.dta: var1-var6 hold .a .b .c .x .y .z, var7/var8
    # system '.', var9 = 1 (pandas.read_stata shows all-NaN + 1.0)
    assert row["var1_null"] == ".a"
    assert row["var6_null"] == ".z"
    assert row["var7_null"] == "."
    assert row["var9"] == 1.0 and row["var9_null"] is None
    # indicator columns interleave right after their source column
    cols = df.columns
    assert cols.index("var1_null") == cols.index("var1") + 1


def test_struct_mode(spark):
    df = _scan(spark, DTA, informative_nulls="struct")
    f = dict(zip(df.columns, [x.dataType.simpleString() for x in df.schema.fields]))
    assert f["var1"] == "struct<var1:float,null_indicator:string>"
    row = df.collect()[0]
    assert row["var1"]["null_indicator"] == ".a"
    assert row["var9"][df.select("var9.*").columns[0]] == 1.0


def test_merged_mode(spark):
    df = _scan(spark, DTA, informative_nulls="merged")
    assert all(t == "string" for _, t in df.dtypes)
    row = df.collect()[0]
    assert row["var1"] == ".a"
    assert row["var9"] == "1"


def test_custom_suffix_and_selection(spark):
    df = _scan(
        spark, DTA,
        informative_nulls="separate",
        informative_null_columns=["var1", "var9"],
        informative_null_suffix="_miss",
    )
    assert "var1_miss" in df.columns
    assert "var2_miss" not in df.columns and "var2_null" not in df.columns


def test_sav_declared_missing_indicators(spark):
    """SPSS: discrete declared → value string (or label with
    use_value_labels, M5); range → MISSING; sysmis → plain null."""
    if not os.path.isfile(SAV):
        pytest.skip("corpus missing")
    df = _scan(spark, SAV, informative_nulls="separate")
    vals = [(r.mynum, r.mynum_null, r.mylabl_null) for r in df.collect()]
    assert vals[5] == (None, "-1", "-1")  # discrete -1 declared missing
    assert vals[6][1] == "MISSING"  # 2000-3000 range hit
    labeled = _scan(
        spark, SAV, informative_nulls="separate", use_value_labels="true"
    )
    r5 = labeled.collect()[5]
    assert r5.mylabl_null == "undetermined"  # label preferred (M5)


def test_row_count_and_projection_unaffected(spark):
    df = _scan(spark, DTA, informative_nulls="separate", columns=["var1"])
    assert df.columns == ["var1", "var1_null"]
    assert df.count() == 1
