"""Metadata surface tests (SURVEY §1.4): metadata_dict, the canonical
12-column metadata_df (identical schema for every format — reference
src/metadata_df.rs), and the W7 metadata-driven write merge."""

from __future__ import annotations

import os

import pytest

SPSS = "/root/reference/crates/polars_readstat_rs/tests/spss/data"
STATA = "/root/reference/crates/polars_readstat_rs/tests/stata/data"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


def test_metadata_df_schema_is_format_invariant(spark, tmp_path):
    from polars_readstat_spark.operators.metadata import (
        METADATA_DF_SCHEMA,
        metadata_df,
    )

    import polars_readstat_spark as prs

    paths = []
    if os.path.isfile(f"{SPSS}/sample.sav"):
        paths.append(f"{SPSS}/sample.sav")
        paths.append(f"{SPSS}/sample.por")
    # generate dta + xpt + sav from one frame
    df = spark.range(3).selectExpr("cast(id as double) as v", "string(id) as s")
    for ext in ("dta", "sav", "xpt", "por"):
        p = str(tmp_path / f"m.{ext}")
        prs.write_readstat(df, p)
        paths.append(p)
    for p in paths:
        mdf = metadata_df(spark, p)
        assert mdf.schema == METADATA_DF_SCHEMA, p
        assert mdf.count() > 0, p


def test_sav_metadata_df_content(spark):
    if not os.path.isfile(f"{SPSS}/sample.sav"):
        pytest.skip("corpus missing")
    from polars_readstat_spark.operators.metadata import metadata_df

    rows = {r["name"]: r for r in metadata_df(spark, f"{SPSS}/sample.sav").collect()}
    assert rows["mylabl"]["value_label_codes"] == ["1", "2"]
    assert rows["mylabl"]["value_label_labels"] == ["Male", "Female"]
    assert rows["myord"]["measure"] == "ordinal"
    assert rows["mydate"]["format_type"] == "EDATE"


def test_metadata_dict_sav(spark):
    if not os.path.isfile(f"{SPSS}/sample.sav"):
        pytest.skip("corpus missing")
    import polars_readstat_spark as prs

    md = prs.read_metadata(f"{SPSS}/sample.sav")
    assert md["row_count"] == 5
    assert md["compression"] == "bytecode"
    names = [v["name"] for v in md["variables"]]
    assert names[0] == "mychar"


def test_metadata_driven_write_kwargs_win(spark, tmp_path):
    """W7: metadata merged with kwargs, kwargs win (reference
    _coalesce_metadata_dfs, __init__.py:1217-1247)."""
    if not os.path.isfile(f"{SPSS}/sample.sav"):
        pytest.skip("corpus missing")
    import polars_readstat_spark as prs

    src = spark.read.format("readstat").load(f"{SPSS}/sample.sav").select(
        "mynum", "mylabl"
    )
    p = str(tmp_path / "w7.dta")
    prs.write_readstat(
        src, p,
        metadata=prs.read_metadata(f"{SPSS}/sample.sav"),
        variable_labels={"mynum": "OVERRIDE"},
    )
    md = prs.read_metadata(p)
    got = {v["name"]: v for v in md["variables"]}
    assert got["mynum"]["label"] == "OVERRIDE"  # kwarg won
    assert got["mylabl"]["label"] == "labeled"  # metadata carried
    assert got["mylabl"]["value_labels"] == {"1": "Male", "2": "Female"}


def test_metadata_df_form_merge(spark, tmp_path):
    """W7 DataFrame form: 12-col metadata_df as the metadata source,
    merged via full-outer join + coalesce."""
    if not os.path.isfile(f"{SPSS}/sample.sav"):
        pytest.skip("corpus missing")
    from polars_readstat_spark.operators.metadata import metadata_df

    import polars_readstat_spark as prs

    mdf = metadata_df(spark, f"{SPSS}/sample.sav")
    src = spark.read.format("readstat").load(f"{SPSS}/sample.sav").select(
        "mynum", "mylabl"
    )
    p = str(tmp_path / "w7df.sav")
    prs.write_readstat(src, p, metadata=mdf,
                       variable_labels={"mynum": "NUM2"})
    back = spark.read.format("readstat").load(p)
    md = {f.name: f.metadata for f in back.schema.fields}
    assert md["mynum"]["label"] == "NUM2"
    assert md["mylabl"]["label"] == "labeled"


def test_sql_ddl_using_readstat(spark, tmp_path):
    """SQL-first integration: CREATE TEMPORARY VIEW ... USING readstat
    exposes the data source to pure-SQL users (the Spark analogue of
    the reference's register_io_source binding)."""
    import polars_readstat_spark as prs

    p = str(tmp_path / "t.dta")
    prs.write_readstat(
        spark.range(5).selectExpr("cast(id as double) as x"), p
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW stata_ddl USING readstat "
        f"OPTIONS (path '{p}')"
    )
    assert spark.sql("SELECT SUM(x) AS s FROM stata_ddl").collect()[0].s == 10.0
