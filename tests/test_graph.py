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


def test_star_equivalent_to_propagation_on_random_graphs(spark):
    import random

    from polars_readstat_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    for trial in range(4):
        n = 60
        n_edges = (8, 25, 60, 120)[trial]
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        edges = [(a + 1000, b + 1000) for a, b in edges if a != b]
        if not edges:
            edges = [(1001, 1002)]
        e = spark.createDataFrame(edges, "src long, dst long")
        prop = {r.node: r.label for r in connected_components(e).collect()}
        star = {
            r.node: r.label for r in connected_components_star(e).collect()
        }
        assert star == prop, f"trial {trial}: star != propagation"


def test_connected_components_string_ids_diameter_ge_2(spark):
    """Non-numeric node ids must still converge on multi-round graphs.

    Regression: the convergence test used to cast labels to decimal,
    which NULLs on strings — the sum came back None every round, so
    None == None broke the loop after ONE propagation round and a
    string-id chain of diameter >= 2 came back partially merged.
    """
    from polars_readstat_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    # chain a-b-c-d-e needs >= 4 propagation rounds to label e with 'a'
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "src string, dst string",
    )
    for fn in (connected_components, connected_components_star):
        got = {r.node: r.label for r in fn(edges).collect()}
        assert got == {
            "a": "a",
            "b": "a",
            "c": "a",
            "d": "a",
            "e": "a",
            "x": "x",
            "y": "x",
        }, fn.__name__


def test_star_max_rounds_exhausted_warns_no_duplicates(spark):
    import warnings as w

    from polars_readstat_spark.functions.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(300, 330)], "src long, dst long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out = connected_components_star(edges, max_rounds=1).collect()
    assert any("fixpoint" in str(c.message) for c in caught)
    # one row per node even without convergence (MIN safety net)
    assert len(out) == len({r.node for r in out}) == 31


def test_star_long_chain(spark):
    from polars_readstat_spark.functions.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(500, 540)], "src long, dst long"
    )
    out = connected_components_star(edges)
    rows = out.collect()
    assert {r.label for r in rows} == {500}
    assert len(rows) == 41
