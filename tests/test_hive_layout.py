"""Hive-style partitioned export (writers/hive.py): key=value/
subdirectories, one zone-map manifest each, key columns kept IN the
data so constant-column zone maps give exact pruning (=, IN, ranges,
and != via the negated-constant rule) without path parsing."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def hive_dir(spark, tmp_path_factory):
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path_factory.mktemp("hive") / "lake")
    df = spark.range(6000).select(
        (2020 + F.col("id") % 3).cast("int").alias("year"),
        F.col("id").cast("double").alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 7).cast("string")).alias("u"),
    )
    out = prs.write_readstat_partitioned(
        df, d, ext="dta", partition_by=["year"]
    )
    assert sum(p["n_rows"] for p in out) == 6000
    return d


def test_layout_and_manifests(hive_dir):
    subs = sorted(os.listdir(hive_dir))
    assert subs == ["year=2020", "year=2021", "year=2022"]
    for sub in subs:
        sd = os.path.join(hive_dir, sub)
        parts = [f for f in os.listdir(sd) if f.endswith(".dta")]
        assert parts
        m = json.load(open(os.path.join(sd, "_prs_stats.json")))
        assert sorted(m["files"]) == sorted(parts)
        year = int(sub.split("=")[1])
        for e in m["files"].values():
            c = e["cols"]["year"]
            # the key is a CONSTANT column per file — the shape the
            # negated-constant refutation prunes `year != X` with
            assert c["min"] == c["max"] == year


def test_glob_scan_reads_everything(spark, hive_dir):
    df = (
        spark.read.format("readstat")
        .load(os.path.join(hive_dir, "year=*", "*.dta"))
    )
    assert df.count() == 6000
    assert df.agg(F.sum("v")).collect()[0][0] == sum(range(6000))


def test_key_predicates_prune_across_subdirs(spark, hive_dir):
    from polars_readstat_spark.operators.scan_explain import explain_scan

    glob = os.path.join(hive_dir, "year=*", "*.dta")
    full = explain_scan(None, glob)["totals"]["planned_partitions"]
    eq = explain_scan(None, glob, where="year = 2021")["totals"]
    ne = explain_scan(None, glob, where="year <> 2021")["totals"]
    assert 0 < eq["pruned_partitions"] < full
    assert 0 < ne["pruned_partitions"] < full
    assert eq["pruned_partitions"] + ne["pruned_partitions"] == full
    n = (
        spark.read.format("readstat")
        .option("where", "year = 2021")
        .load(glob)
        .count()
    )
    assert n == 2000


def test_chunk_rows_splits_files(spark, tmp_path):
    import polars_readstat_spark as prs

    d = str(tmp_path / "chunked")
    df = spark.range(5000).select(
        F.lit(7).cast("int").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    prs.write_readstat_hive(
        df, d, ext="dta", partition_by=["k"], chunk_rows=1500
    )
    sd = os.path.join(d, "k=7")
    parts = sorted(f for f in os.listdir(sd) if f.endswith(".dta"))
    assert len(parts) >= 3  # 5000 rows / 1500-row chunks
    back = spark.read.format("readstat").load(sd)
    assert back.count() == 5000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(5000))


def test_null_and_date_keys(spark, tmp_path):
    import datetime

    import polars_readstat_spark as prs

    d = str(tmp_path / "nulldate")
    df = spark.range(100).select(
        F.when(
            F.col("id") % 2 == 0, F.lit(datetime.date(2024, 3, 1))
        ).alias("day"),
        F.col("id").cast("double").alias("v"),
    )
    prs.write_readstat_hive(df, d, partition_by=["day"])
    subs = sorted(os.listdir(d))
    assert subs == ["day=2024-03-01", "day=__null__"]
    back = spark.read.format("readstat").load(
        os.path.join(d, "*", "*.dta")
    )
    assert back.count() == 100
    assert back.where(F.col("day").isNull()).count() == 50


def test_float_keys_rejected(spark, tmp_path):
    import polars_readstat_spark as prs

    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="fractional"):
        prs.write_readstat_hive(
            df, str(tmp_path / "f"), partition_by=["x"]
        )
    with pytest.raises(ValueError, match="not in"):
        prs.write_readstat_hive(
            df, str(tmp_path / "g"), partition_by=["nope"]
        )


def test_multi_key_and_bloom_options(spark, tmp_path):
    import polars_readstat_spark as prs

    d = str(tmp_path / "multikey")
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("int").alias("a"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("b"),
        ((F.col("id") * 7919) % 100).cast("double").alias("key"),
        F.col("id").cast("double").alias("v"),
    )
    prs.write_readstat_hive(
        df, d, partition_by=["a", "b"], zonemap_bloom_columns="key"
    )
    subs = sorted(
        os.path.join(p, q)
        for p in os.listdir(d)
        for q in os.listdir(os.path.join(d, p))
    )
    assert subs == ["a=0/b=s0", "a=1/b=s1"]
    m = json.load(
        open(os.path.join(d, "a=0", "b=s0", "_prs_stats.json"))
    )
    for e in m["files"].values():
        assert e["cols"]["key"]["bf"]["d"] == "num"
    back = spark.read.format("readstat").load(
        os.path.join(d, "*", "*", "*.dta")
    )
    assert back.count() == 2000
