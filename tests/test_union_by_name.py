"""Multi-file schema-drift tolerance: union_by_name unions columns by
name across files, null-fills gaps, widens numerics, and rejects
irreconcilable types — the 100 TB survey-lake shape where waves add
variables and storage types narrow per-extract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import polars_readstat_spark as prs


@pytest.fixture(scope="module")
def drift_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("drift"))
    a = spark.range(0, 100).select(
        F.col("id").cast("int").alias("pid"),
        (F.col("id") % 7).cast("smallint").alias("code"),
        F.concat(F.lit("w1_"), F.col("id").cast("string")).alias("note"),
    )
    b = spark.range(100, 160).select(
        F.col("id").cast("int").alias("pid"),
        (F.col("id") * 0.5).alias("code"),          # widened to double
        (F.col("id") % 3 == 0).cast("double").alias("extra"),  # new var
    )
    prs.write_readstat(a, os.path.join(d, "wave1.dta"))
    prs.write_readstat(b, os.path.join(d, "wave2.dta"))
    return d


def test_union_by_name_schema_and_values(spark, drift_dir):
    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("union_by_name", "true")
        .load(drift_dir)
    )
    # first-seen column order; smallint+double code widens to double
    assert df.columns == ["pid", "code", "note", "extra"]
    assert dict(df.dtypes)["code"] == "double"
    assert df.count() == 160
    rows = {r["pid"]: r for r in df.collect()}
    assert rows[3]["code"] == 3.0 and rows[3]["note"] == "w1_3"
    assert rows[3]["extra"] is None          # wave1 lacks extra
    assert rows[150]["code"] == 75.0
    assert rows[150]["note"] is None         # wave2 lacks note
    assert rows[150]["extra"] == 1.0


def test_union_by_name_projection(spark, drift_dir):
    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("union_by_name", "true")
        .option("columns", "pid,extra")
        .load(drift_dir)
    )
    assert df.columns == ["pid", "extra"]
    assert df.filter(F.col("extra").isNotNull()).count() == 60  # wave2
    assert df.filter(F.col("extra") == 1.0).count() == 20  # id % 3 == 0
    assert df.count() == 160  # wave1 rows survive as null extra

    with pytest.raises(Exception, match="unknown columns"):
        (
            spark.read.format("readstat")
            .option("union_by_name", "true")
            .option("columns", "pid,nope")
            .load(drift_dir)
            .count()
        )


def test_union_by_name_rejects_type_conflicts(spark, tmp_path):
    d = str(tmp_path / "bad")
    os.makedirs(d)
    a = spark.range(5).select(F.col("id").cast("int").alias("x"))
    b = spark.range(5).select(F.col("id").cast("string").alias("x"))
    prs.write_readstat(a, os.path.join(d, "a.dta"))
    prs.write_readstat(b, os.path.join(d, "b.dta"))
    prs.register(spark)
    with pytest.raises(Exception, match="cannot reconcile"):
        (
            spark.read.format("readstat")
            .option("union_by_name", "true")
            .load(d)
            .count()
        )


def test_multifile_without_option_unchanged(spark, drift_dir):
    """Without union_by_name, drifted schemas keep today's fail-fast
    behavior rather than silently misreading."""
    prs.register(spark)
    with pytest.raises(Exception):
        (
            spark.read.format("readstat")
            .load(drift_dir)
            .collect()
        )
