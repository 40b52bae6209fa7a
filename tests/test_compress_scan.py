"""Scan-time compress option tests (C1-C5, reference
src/stata/compress.rs + pybindings.rs:374-423): sample-inferred
narrowing with a stable schema across all batches/partitions."""

from __future__ import annotations

import os

import pytest

SAV = "/root/reference/crates/polars_readstat_rs/tests/spss/data/sample.sav"
BIG = "/root/reference/crates/polars_readstat_rs/tests/spss/data/sample_large.sav"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


@pytest.mark.skipif(not os.path.isfile(SAV), reason="corpus missing")
def test_compress_narrows_labeled_doubles(spark):
    df = (
        spark.read.format("readstat").option("compress", "true").load(SAV)
    )
    t = dict(df.dtypes)
    assert t["mylabl"] == "tinyint"  # 1-2 fits int8
    assert t["myord"] == "tinyint"
    assert t["mynum"] == "double"  # fractional stays double
    assert t["mytime"] == "bigint"  # int64 never widens to double
    # values survive the narrowing
    assert [r.mylabl for r in df.collect()] == [1, 2, 1, 2, 1]


@pytest.mark.skipif(not os.path.isfile(BIG), reason="corpus missing")
def test_compress_stable_across_partitions(spark):
    one = (
        spark.read.format("readstat")
        .option("compress", "true")
        .load(BIG)
        .collect()
    )
    many = (
        spark.read.format("readstat")
        .option("compress", "true")
        .option("rows_per_partition", "57")
        .load(BIG)
        .collect()
    )
    assert one == many


def test_compress_dta_roundtrip_types(spark, tmp_path):
    """write doubles that hold small ints → compressed scan reads them
    back narrow; datetime at midnight → date (C3); numeric strings →
    numeric (C4)."""
    import datetime

    import polars_readstat_spark as prs
    from pyspark.sql import Row

    rows = [
        Row(a=float(i % 3), b=float(i * 1000), s=str(i % 7),
            ts=datetime.datetime(2020, 1, 1 + i))
        for i in range(6)
    ]
    p = str(tmp_path / "c.dta")
    prs.write_readstat(spark.createDataFrame(rows), p)
    df = (
        spark.read.format("readstat").option("compress", "true").load(p)
    )
    t = dict(df.dtypes)
    assert t["a"] == "tinyint"
    assert t["b"] == "smallint"
    assert t["s"] == "tinyint"  # "0".."6" parse → int8
    assert t["ts"] == "date"  # all-midnight
    got = df.orderBy("b").collect()
    assert [r.a for r in got] == [0, 1, 2, 0, 1, 2]
    assert got[3].ts == datetime.date(2020, 1, 4)
