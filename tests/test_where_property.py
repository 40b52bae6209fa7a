"""Property test for the `where` option end to end: random
conjunctions (with OR groups, NOT, IN, IS NULL, LIKE) render to the
grammar, parse back to the same AST, and the pruned+filtered scan
returns EXACTLY the rows a pure-Python three-valued-logic evaluator
selects — so zone-map refutation (file and stripe) can never drop a
matching row for any generated predicate, and the batch masks agree
with SQL semantics on nulls."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringStartsWith,
)

from polars_readstat_spark.sources.filters import OrGroup, parse_where

N = 600
STRS = ["aa", "ab", "b", "ba", "zz", "a'q"]  # incl. a quote


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    """Sink-written dir (manifest + 64-row stripes): id sorted across
    4 parts, v with nulls, s cycling over STRS."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path_factory.mktemp("whereprop") / "out")
    rows = [
        (
            i,
            None if i % 7 == 0 else i * 0.5,
            STRS[i % len(STRS)],
            None
            if i % 11 == 0
            else dt.date(1994, 1, 1) + dt.timedelta(days=i // 4),
        )
        for i in range(N)
    ]
    sdf = spark.createDataFrame(
        rows, "id long, v double, s string, d date"
    )
    (
        sdf.repartitionByRange(4, "id")
        .sortWithinPartitions("id")
        .write.format("readstat")
        .option("format", "dta")
        .option("zonemap_stripe_rows", "64")
        .mode("overwrite")
        .save(d)
    )
    return d, rows


# ------------------------- AST generation + rendering -------------------

_num_ops = {
    "=": EqualTo,
    "<": LessThan,
    "<=": LessThanOrEqual,
    ">": GreaterThan,
    ">=": GreaterThanOrEqual,
}


def _esc(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@st.composite
def leaf(draw):
    col = draw(st.sampled_from(["id", "v", "s", "d"]))
    if col == "d":
        kind = draw(st.sampled_from(["cmp", "null"]))
        if kind == "null":
            isnull = draw(st.booleans())
            return (
                (IsNull(("d",)), "d IS NULL")
                if isnull
                else (IsNotNull(("d",)), "d IS NOT NULL")
            )
        op = draw(st.sampled_from(list(_num_ops)))
        day = draw(st.integers(min_value=-3, max_value=N // 4 + 3))
        val = dt.date(1994, 1, 1) + dt.timedelta(days=day)
        return (
            _num_ops[op](("d",), val),
            f"d {op} DATE '{val.isoformat()}'",
        )
    if col == "s":
        kind = draw(st.sampled_from(["cmp", "in", "null", "like"]))
        if kind == "cmp":
            op = draw(st.sampled_from(list(_num_ops)))
            val = draw(st.sampled_from(STRS + ["m", ""]))
            return _num_ops[op](("s",), val), f"s {op} {_esc(val)}"
        if kind == "in":
            vals = tuple(
                draw(
                    st.lists(
                        st.sampled_from(STRS), min_size=1, max_size=3
                    )
                )
            )
            lit = ", ".join(_esc(v) for v in vals)
            return In(("s",), vals), f"s IN ({lit})"
        if kind == "like":
            pre = draw(st.sampled_from(["a", "b", "z", "aa"]))
            return (
                StringStartsWith(("s",), pre),
                f"s LIKE {_esc(pre + '%')}",
            )
        isnull = draw(st.booleans())
        return (
            (IsNull(("s",)), "s IS NULL")
            if isnull
            else (IsNotNull(("s",)), "s IS NOT NULL")
        )
    # numeric columns
    kind = draw(st.sampled_from(["cmp", "in", "null"]))
    if kind == "null":
        isnull = draw(st.booleans())
        return (
            (IsNull((col,)), f"{col} IS NULL")
            if isnull
            else (IsNotNull((col,)), f"{col} IS NOT NULL")
        )
    if kind == "in":
        vals = tuple(
            draw(
                st.lists(
                    st.integers(min_value=-5, max_value=N + 5),
                    min_size=1,
                    max_size=3,
                )
            )
        )
        lit = ", ".join(str(v) for v in vals)
        return In((col,), vals), f"{col} IN ({lit})"
    op = draw(st.sampled_from(list(_num_ops)))
    val = draw(st.integers(min_value=-5, max_value=N + 5))
    return _num_ops[op]((col,), val), f"{col} {op} {val}"


@st.composite
def term(draw):
    shape = draw(st.sampled_from(["plain", "not", "or", "between"]))
    if shape == "between":
        col = draw(st.sampled_from(["id", "v"]))
        lo = draw(st.integers(min_value=-5, max_value=N))
        hi = draw(st.integers(min_value=lo - 2, max_value=N + 5))
        neg = draw(st.booleans())
        if neg:
            return (
                [
                    OrGroup(
                        (
                            Not(GreaterThanOrEqual((col,), lo)),
                            Not(LessThanOrEqual((col,), hi)),
                        )
                    )
                ],
                f"{col} NOT BETWEEN {lo} AND {hi}",
            )
        return (
            [
                GreaterThanOrEqual((col,), lo),
                LessThanOrEqual((col,), hi),
            ],
            f"{col} BETWEEN {lo} AND {hi}",
        )
    ast, txt = draw(leaf())
    if shape == "not":
        return [Not(ast)], f"NOT {txt}"
    if shape == "or":
        ast2, txt2 = draw(leaf())
        return [OrGroup((ast, ast2))], f"({txt} OR {txt2})"
    return [ast], txt


@st.composite
def conjunction(draw):
    parts = draw(st.lists(term(), min_size=1, max_size=3))
    asts = [a for lst, _ in parts for a in lst]
    return asts, " AND ".join(t for _, t in parts)


# ------------------------------ 3VL evaluator ---------------------------

def _ev(f, row) -> bool | None:
    if isinstance(f, OrGroup):
        vals = [_ev(c, row) for c in f.children]
        if True in vals:
            return True
        return None if None in vals else False
    if isinstance(f, Not):
        v = _ev(f.child, row)
        return None if v is None else (not v)
    col = f.attribute[0]
    val = {"id": row[0], "v": row[1], "s": row[2], "d": row[3]}[col]
    if isinstance(f, IsNull):
        return val is None
    if isinstance(f, IsNotNull):
        return val is not None
    if val is None:
        return None
    if isinstance(f, EqualTo):
        return val == f.value
    if isinstance(f, GreaterThan):
        return val > f.value
    if isinstance(f, GreaterThanOrEqual):
        return val >= f.value
    if isinstance(f, LessThan):
        return val < f.value
    if isinstance(f, LessThanOrEqual):
        return val <= f.value
    if isinstance(f, In):
        return val in f.value
    if isinstance(f, StringStartsWith):
        return val.startswith(f.value)
    raise AssertionError(f)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cj=conjunction())
def test_where_matches_three_valued_truth(fixture_dir, cj):
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    d, rows = fixture_dir
    ast, txt = cj
    assert parse_where(txt) == ast  # grammar round trip
    want = sorted(
        r[0] for r in rows if all(_ev(f, r) is True for f in ast)
    )
    ds = ReadstatDataSource({"path": d, "where": txt})
    reader = ds.reader(ds._schema_uncompressed())
    got = []
    for p in reader.partitions():
        if p is None:
            continue
        for b in reader.read(p):
            idx = b.schema.names.index("id")
            got.extend(b.column(idx).to_pylist())
    assert sorted(got) == want, txt
