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


def test_stream_ingest_aligns_drifted_files(spark, tmp_path):
    """Streaming landing zone with union_by_name: a later file with a
    drifted schema (missing column, widened type source) aligns to
    the stream's fixed schema instead of failing the microbatch."""
    import polars_readstat_spark as prs

    src = str(tmp_path / "landing")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    a = spark.range(0, 40).select(
        F.col("id").cast("int").alias("pid"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("note"),
    )
    prs.write_readstat(a, src + "/.tmp.a.dta")
    os.replace(src + "/.tmp.a.dta", src + "/a.dta")
    prs.register(spark)

    def drain():
        q = (
            spark.readStream.format("readstat")
            .option("union_by_name", "true")
            .load(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.read.parquet(out).collect()

    first = drain()
    assert len(first) == 40

    # drifted wave: no `note`, v stored narrower
    b = spark.range(100, 130).select(
        F.col("id").cast("int").alias("pid"),
        (F.col("id") % 50).cast("smallint").alias("v"),
    )
    prs.write_readstat(b, src + "/.tmp.b.dta")
    os.replace(src + "/.tmp.b.dta", src + "/b.dta")
    rows = {r["pid"]: r for r in drain()}
    assert len(rows) == 70
    assert rows[105]["v"] == 5.0 and rows[105]["note"] is None
    assert rows[7]["note"] == "n7"


def test_union_by_name_sav(spark, tmp_path):
    """The union machinery is format-generic: same drift scan over
    SPSS .sav files."""
    import polars_readstat_spark as prs

    d = str(tmp_path / "savdrift")
    os.makedirs(d)
    a = spark.range(0, 30).select(
        F.col("id").cast("double").alias("pid"),
        (F.col("id") % 5).cast("double").alias("grp"),
    )
    b = spark.range(30, 50).select(
        F.col("id").cast("double").alias("pid"),
        F.lit(1.5).alias("w"),
    )
    prs.write_readstat(a, os.path.join(d, "a.sav"))
    prs.write_readstat(b, os.path.join(d, "b.sav"))
    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("union_by_name", "true")
        .load(d)
    )
    assert df.columns == ["pid", "grp", "w"]
    assert df.count() == 50
    rows = {r["pid"]: r for r in df.collect()}
    assert rows[3.0]["grp"] == 3.0 and rows[3.0]["w"] is None
    assert rows[40.0]["grp"] is None and rows[40.0]["w"] == 1.5


def test_filter_pushdown_over_union(spark, drift_dir):
    """Pushed filters evaluate on ALIGNED batches: predicates on a
    column one file lacks see the null fill, with SQL semantics."""
    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("union_by_name", "true")
        .load(drift_dir)
    )
    assert df.filter(F.col("extra").isNull()).count() == 100  # wave1
    # wave2 code = id*0.5 over [100,160): > 60 keeps ids 121..159
    assert df.filter(F.col("code") > 60.0).count() == 39
    assert df.filter(F.col("note").isNotNull()).count() == 100
