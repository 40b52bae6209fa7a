"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — this is the
fast local replica of that gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

import __spark_entry__ as entrymod
from tools.check_oracle import normalize


def _pairs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return sorted(oracles), qs, oracles


_NAMES, _QS, _ORACLES = _pairs()


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(name, spark, duck):
    sdf = _QS[name](spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    _, ns = normalize(srows, scols)
    _, nd = normalize(drows, dcols)
    bad = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not bad, f"{name}: {len(bad)} mismatched rows, first: {bad[:2]}"


def test_queries_without_oracle_run(spark):
    for name, fn in _QS.items():
        if name in _ORACLES:
            continue
        assert fn(spark, SF_SMALL).count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
