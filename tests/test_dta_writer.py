"""Roundtrip tests for the Stata writer: write with us, read with
pandas (independent oracle) AND our own reader — the reference's
write-read roundtrip strategy (tests/test_write_roundtrip.py)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

import polars_readstat_spark as prs


@pytest.fixture(scope="module")
def sample_pdf():
    return pd.DataFrame(
        {
            "i8": pd.array([1, None, 3, 2], dtype="Int8"),
            "i16": pd.array([100, 200, None, -300], dtype="Int16"),
            "i32": pd.array([1000, None, 3000, -4], dtype="Int32"),
            "i64small": pd.array([10, 20, 30, 40], dtype="Int64"),
            "i64big": pd.array([2**40, 5, None, -(2**41)], dtype="Int64"),
            "f32": pd.array([1.5, None, 2.5, -0.25], dtype="Float32"),
            "f64": [0.1, np.nan, 0.3, -4.5],
            "s": ["hello", "", "wörld", "x" * 50],
            "d": [
                datetime.date(2020, 1, 1),
                None,
                datetime.date(1959, 12, 31),
                datetime.date(2030, 6, 15),
            ],
            "ts": [
                datetime.datetime(2020, 1, 1, 12, 30),
                None,
                datetime.datetime(1960, 1, 1),
                datetime.datetime(1999, 12, 31, 23, 59, 59),
            ],
        }
    )


@pytest.fixture(scope="module")
def written(spark, sample_pdf, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("w") / "out.dta")
    df = spark.createDataFrame(sample_pdf)
    prs.write_readstat(
        df,
        p,
        data_label="roundtrip test",
        variable_labels={"i8": "tiny col"},
        value_labels={"i8": {1: "one", 2: "two", 3: "three"}},
    )
    return p


def test_pandas_reads_our_file(written, sample_pdf):
    ref = pd.read_stata(written, convert_categoricals=False)
    assert len(ref) == 4
    assert list(ref.columns) == list(sample_pdf.columns)
    # values + missing placement
    assert ref["i8"].tolist()[0] == 1.0 and np.isnan(ref["i8"].tolist()[1])
    assert ref["i64small"].dtype.kind == "i"
    assert ref["i64big"].iloc[0] == float(2**40)
    assert ref["s"].tolist()[2] == "wörld"
    assert str(ref["d"].iloc[0]) == "2020-01-01 00:00:00"
    assert str(ref["ts"].iloc[3]) == "1999-12-31 23:59:59"


def test_our_reader_roundtrips(written, spark, sample_pdf):
    got = prs.scan_readstat(spark, written).toPandas()
    assert len(got) == 4
    for c in ("i8", "i16", "i32", "f64"):
        a, b = got[c], sample_pdf[c].astype("float64")
        assert ((a.values == b.values) | (a.isna() & b.isna()).values).all(), c
    assert got["s"].tolist() == sample_pdf["s"].tolist()


def test_value_labels_roundtrip(written, spark):
    lab = pd.read_stata(written, convert_categoricals=True)
    assert lab["i8"].tolist()[0] == "one"
    ours = prs.scan_readstat(
        spark, written, columns=["i8"], value_labels_as_strings=True
    ).toPandas()
    assert ours["i8"].tolist()[0] == "one"


def test_metadata_survives(written):
    meta = prs.read_metadata(written)
    assert meta["row_count"] == 4
    v = [x for x in meta["variables"] if x["name"] == "i8"][0]
    assert v["label"] == "tiny col"
    assert v["value_labels"] == {"1": "one", "2": "two", "3": "three"}


def test_multi_partition_write(spark, tmp_path):
    """Writer consumes partitioned input in partition order."""
    p = str(tmp_path / "mp.dta")
    df = (
        spark.range(0, 10000, 1, 8)
        .selectExpr("CAST(id AS INT) AS id", "CAST(id * 0.5 AS DOUBLE) AS v")
    )
    prs.write_readstat(df, p)
    ref = pd.read_stata(p)
    assert len(ref) == 10000
    assert ref["id"].tolist() == sorted(ref["id"].tolist())
    assert ref["v"].iloc[17] == 8.5


def test_strl_write_roundtrip(spark, tmp_path):
    """Strings wider than 2045 bytes are written as strL (GSO refs);
    pandas reads the same values back (external oracle)."""
    import pandas as pd
    from pyspark.sql import Row

    import polars_readstat_spark as prs

    rows = [
        Row(i=k, big=("lorem ipsum " * 400 + str(k)) if k % 3 else "",
            small=f"s{k}")
        for k in range(100)
    ]
    df = spark.createDataFrame(rows).repartition(3)
    p = str(tmp_path / "strl.dta")
    prs.write_readstat(df, p)
    back = spark.read.format("readstat").load(p)
    got = {r.i: (r.big, r.small) for r in back.collect()}
    src = {r.i: (r.big, r.small) for r in df.collect()}
    assert got == src
    pdf = pd.read_stata(p).sort_values("i")
    assert pdf["big"].tolist() == [src[k][0] for k in sorted(src)]


def test_int_columns_promote_past_stata_missing_sentinels(spark, tmp_path):
    """Stata reserves the top of each integer range for missing codes
    (byte > 100, int > 32740, long > 2147483620). Values in the
    reserved band must promote the column to the next type instead of
    reading back as missing (hypothesis-found regression)."""
    import polars_readstat_spark as prs

    prs.register(spark)
    rows = [
        (1, 100, 32740, 2147483620, -127),
        (2, 101, 32741, 2147483621, -128),
        (3, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, b tinyint, s smallint, i int, t2 tinyint"
    )
    p = str(tmp_path / "sentinels.dta")
    prs.write_readstat(df, p)
    back = {
        r.id: (r.b, r.s, r.i, r.t2)
        for r in spark.read.format("readstat").load(p).collect()
    }
    assert back[1] == (100, 32740, 2147483620, -127)
    assert back[2] == (101, 32741, 2147483621, -128)
    assert back[3] == (None, None, None, None)


def test_int_columns_keep_natural_width_when_in_range(spark, tmp_path):
    """In-range columns keep their Spark type's natural Stata floor —
    the pre-pass only promotes, never downcasts (stable dtypes)."""
    import polars_readstat_spark as prs

    from polars_readstat_spark.sources.dta.meta import parse_dta_meta

    prs.register(spark)
    df = spark.createDataFrame(
        [(1, 5, 7), (2, 6, 8)], "i int, s smallint, b tinyint"
    )
    p = str(tmp_path / "widths.dta")
    prs.write_readstat(df, p)
    codes = {v.name: v.typecode for v in parse_dta_meta(p).variables}
    assert codes["i"] == 65528  # long
    assert codes["s"] == 65529  # int
    assert codes["b"] == 65530  # byte


def test_float_column_promotes_past_float_missing_threshold(spark, tmp_path):
    """float32 values above Stata's float missing threshold (~1.7e38)
    promote the column to double instead of reading back missing."""
    import polars_readstat_spark as prs

    prs.register(spark)
    df = spark.createDataFrame(
        [(1, 3.0e38), (2, -3.0e38), (3, 1.5), (4, None)],
        "id long, x float",
    )
    p = str(tmp_path / "bigfloat.dta")
    prs.write_readstat(df, p)
    back = {r.id: r.x for r in spark.read.format("readstat").load(p).collect()}
    import pytest as _pt

    assert back[1] == _pt.approx(3.0e38, rel=1e-6)
    assert back[2] == _pt.approx(-3.0e38, rel=1e-6)
    assert back[3] == _pt.approx(1.5)
    assert back[4] is None


def test_double_past_missing_threshold_raises(spark, tmp_path):
    import pytest as _pt

    import polars_readstat_spark as prs

    df = spark.createDataFrame([(1, 9.5e307)], "id long, x double")
    with _pt.raises(Exception, match="missing-code threshold"):
        prs.write_readstat(df, str(tmp_path / "huge.dta"))


def test_bigint_past_double_exactness_raises(spark, tmp_path):
    """Stata has no int64; bigint past long falls back to double, which
    is exact only to 2^53 — beyond that the writer must refuse rather
    than silently round values on roundtrip."""
    import pytest as _pt

    import polars_readstat_spark as prs

    df = spark.createDataFrame(
        [(1, (1 << 53) + 1)], "id long, big long"
    )
    with _pt.raises(Exception, match="2\\^53"):
        prs.write_readstat(df, str(tmp_path / "big.dta"))

    # at exactly the boundary it still writes (value representable)
    ok = spark.createDataFrame([(1, 1 << 53)], "id long, big long")
    p = str(tmp_path / "edge.dta")
    prs.write_readstat(ok, p)
    prs.register(spark)
    back = spark.read.format("readstat").load(p).collect()
    assert back[0].big == float(1 << 53)


def test_datetime_full_calendar_range(spark, tmp_path):
    """%tc is ms since 1960 stored as double — timestamps far outside
    pandas' ns bounds (year 1 .. 9999) must roundtrip (regression: the
    pack path coerced through datetime64[ns] and raised)."""
    import datetime as dt

    import polars_readstat_spark as prs

    prs.register(spark)
    tss = [
        dt.datetime(1, 1, 2, 0, 0, 0),
        dt.datetime(1582, 10, 15, 12, 30, 0),
        dt.datetime(1959, 12, 31, 23, 59, 59),
        dt.datetime(1960, 1, 1),
        dt.datetime(2262, 4, 11, 23, 47, 16),
        dt.datetime(9999, 12, 31, 23, 59, 59),
        None,
    ]
    df = spark.createDataFrame(list(enumerate(tss)), "i long, ts timestamp")
    p = str(tmp_path / "range.dta")
    prs.write_readstat(df, p)
    back = {
        int(r.i): r.ts for r in spark.read.format("readstat").load(p).collect()
    }
    for i, t in enumerate(tss):
        assert back[i] == t, (i, t, back[i])
