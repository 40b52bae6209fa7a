"""Unit tests for functions/graph.py connected_components."""

from __future__ import annotations


def test_connected_components_chain_and_singletons(spark):
    from pyspark.sql import functions as F

    from polars_readstat_spark.functions.graph import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20} via nodes-only
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(20,), (4,)], "node long")
    out = connected_components(edges, nodes=nodes)
    got = {r.node: r.label for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_path_converges(spark):
    from polars_readstat_spark.functions.graph import connected_components

    # a 12-node path exercises multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "src long, dst long"
    )
    out = connected_components(edges)
    labels = {r.label for r in out.collect()}
    assert labels == {100}
    assert out.count() == 12
