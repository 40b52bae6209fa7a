"""Bucketed-table co-located joins — the 100 TB join strategy.

At cluster scale the dominant cost of a fact⋈fact join is the shuffle
of both sides. Writing the tables bucketed on the join key
(`bucketBy(n, key).sortBy(key)`) fixes the partitioning at write time,
so every later join/aggregation on that key runs with ZERO exchanges:
Spark matches bucket files pairwise per task. These tests pin that
plan property — the same check you'd run before committing a bucketed
layout for a petabyte fact table.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    """orders and customer written bucketed+sorted on the join key."""
    from polars_readstat_spark.tables import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    load_table(spark, SF_SMALL, "orders").write.bucketBy(
        8, "o_custkey"
    ).sortBy("o_custkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, SF_SMALL, "customer").write.bucketBy(
        8, "c_custkey"
    ).sortBy("c_custkey").mode("overwrite").saveAsTable("b_customer")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


@contextlib.contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed):
    with _no_broadcast(spark):
        o = spark.table("b_orders")
        c = spark.table("b_customer")
        j = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_custkey", "c_mktsegment"
        )
        plan = _plan(j)
        # co-located: the join consumes bucket files directly
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        from polars_readstat_spark.tables import load_table

        want = (
            load_table(spark, SF_SMALL, "orders")
            .join(
                load_table(spark, SF_SMALL, "customer"),
                on=[F.col("o_custkey") == F.col("c_custkey")],
            )
            .count()
        )
        assert j.count() == want


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    with _no_broadcast(spark):
        o = spark.table("b_orders")
        agg = o.groupBy("o_custkey").count()
        plan = _plan(agg)
        assert "Exchange" not in plan


def test_unbucketed_join_does_exchange(spark, bucketed):
    """Control: the same join over plain parquet shuffles both sides —
    proving the bucketed plans above aren't trivially exchange-free."""
    from polars_readstat_spark.tables import load_table

    with _no_broadcast(spark):
        o = load_table(spark, SF_SMALL, "orders")
        c = load_table(spark, SF_SMALL, "customer")
        plan = _plan(o.join(c, o.o_custkey == c.c_custkey))
        assert "Exchange" in plan
