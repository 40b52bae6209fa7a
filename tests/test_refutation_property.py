"""Direct accumulator↔refuter soundness fuzz (no Spark): for random
column data and random Filter shapes, (a) the compiled batch mask
agrees with a pure three-valued-logic evaluator, and (b) whenever
`_refutes` fires against stats PUBLISHED from that very data, zero
rows match — the core zone-map invariant, fuzzed across value
classes (ints, NaN/null doubles, near-sentinel magnitudes,
whitespace/NUL strings that trip the poisoning rules, dates) and
every accepted predicate shape including Not/OrGroup/EqualNullSafe.
Hundreds of examples per run; pure-Python + Arrow, so it costs
seconds."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from polars_readstat_spark.sources.filters import (
    OrGroup,
    _compile,
    _refutes,
)
from polars_readstat_spark.writers.spark_sink import (
    ZoneMapStats,
    _publishable_cols,
)

EPOCH = dt.date(1970, 1, 1)

_num_vals = st.one_of(
    st.integers(min_value=-50, max_value=50).map(float),
    st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
    ),
    st.sampled_from(
        [float("nan"), 8.95e307, -8.95e307, 1e-310, -0.0, None]
    ),
)
_str_vals = st.one_of(
    st.text(alphabet="abz '", min_size=0, max_size=4),
    st.sampled_from(["a ", "a\tb", "x\x00y", "", None]),
)
_date_vals = st.one_of(
    st.integers(min_value=-3000, max_value=3000).map(
        lambda d: EPOCH + dt.timedelta(days=d)
    ),
    st.none(),
)


@st.composite
def column(draw):
    kind = draw(st.sampled_from(["num", "str", "date"]))
    vals_st = {"num": _num_vals, "str": _str_vals, "date": _date_vals}[kind]
    vals = draw(st.lists(vals_st, min_size=1, max_size=12))
    return kind, vals


def _operand(draw, kind):
    if kind == "str":
        return draw(st.sampled_from(["a", "a ", "", "zz", "x", 3, None]))
    if kind == "date":
        return draw(
            st.sampled_from(
                [
                    EPOCH,
                    dt.date(1975, 6, 1),
                    dt.date(1960, 1, 1),
                    dt.datetime(1975, 6, 1),
                    5,
                    None,
                ]
            )
        )
    return draw(
        st.sampled_from([0, 3.5, -7, 100.0, True, None, "5"])
    )


@st.composite
def predicate(draw, kind):
    shape = draw(
        st.sampled_from(
            [
                "eq", "eqns", "gt", "ge", "lt", "le", "in", "isnull",
                "notnull", "starts", "ends", "contains", "not", "or",
            ]
        )
    )
    a = ("c",)
    if shape == "not":
        inner = draw(predicate(kind))
        while isinstance(inner, (OrGroup, Not)):
            inner = draw(predicate(kind))
        return Not(inner)
    if shape == "or":
        x = draw(predicate(kind))
        y = draw(predicate(kind))
        if isinstance(x, OrGroup) or isinstance(y, OrGroup):
            return x if not isinstance(x, OrGroup) else y
        return OrGroup((x, y))
    if shape == "isnull":
        return IsNull(a)
    if shape == "notnull":
        return IsNotNull(a)
    if shape == "in":
        vs = tuple(
            _operand(draw, kind) for _ in range(draw(st.integers(1, 3)))
        )
        return In(a, vs)
    if shape in ("starts", "ends", "contains"):
        v = draw(st.sampled_from(["a", "z", "", "a "]))
        cls = {
            "starts": StringStartsWith,
            "ends": StringEndsWith,
            "contains": StringContains,
        }[shape]
        return cls(a, v)
    v = _operand(draw, kind)
    cls = {
        "eq": EqualTo, "eqns": EqualNullSafe, "gt": GreaterThan,
        "ge": GreaterThanOrEqual, "lt": LessThan, "le": LessThanOrEqual,
    }[shape]
    return cls(a, v)


def _cmp(val, op, operand):
    """3VL comparison with Python exact semantics; None = unknown /
    incomparable type (treated as no-match, mirroring SQL errors
    would not occur because Arrow would have raised first — the fuzz
    only asserts on examples whose compile RUNS). A datetime operand
    against a date value compares as the midnight instant (Arrow
    casts date32 to timestamp — SQL semantics; refutation separately
    DECLINES datetime operands, which the soundness leg verifies)."""
    if operand is None:
        # SQL: any comparison with NULL is NULL (Python's == None
        # would say False and flip under NOT — a truth-model trap
        # this fuzz itself caught)
        return None
    if (
        isinstance(val, dt.date)
        and not isinstance(val, dt.datetime)
        and isinstance(operand, dt.datetime)
    ):
        val = dt.datetime.combine(val, dt.time())
    try:
        if op == "eq":
            return val == operand
        if op == "gt":
            return val > operand
        if op == "ge":
            return val >= operand
        if op == "lt":
            return val < operand
        if op == "le":
            return val <= operand
    except TypeError:
        return None
    return None


def _ev(f, val):
    if isinstance(f, OrGroup):
        r = [_ev(c, val) for c in f.children]
        if True in r:
            return True
        return None if None in r else False
    if isinstance(f, Not):
        v = _ev(f.child, val)
        return None if v is None else (not v)
    if isinstance(f, IsNull):
        return val is None or (
            isinstance(val, float) and math.isnan(val)
        )
    if isinstance(f, IsNotNull):
        return not _ev(IsNull(("c",)), val)
    if isinstance(f, EqualNullSafe):
        if val is None or (isinstance(val, float) and math.isnan(val)):
            return f.value is None
        if f.value is None:
            return False
        return _cmp(val, "eq", f.value) is True
    if val is None or (isinstance(val, float) and math.isnan(val)):
        return None
    if isinstance(f, EqualTo):
        return _cmp(val, "eq", f.value)
    if isinstance(f, GreaterThan):
        return _cmp(val, "gt", f.value)
    if isinstance(f, GreaterThanOrEqual):
        return _cmp(val, "ge", f.value)
    if isinstance(f, LessThan):
        return _cmp(val, "lt", f.value)
    if isinstance(f, LessThanOrEqual):
        return _cmp(val, "le", f.value)
    if isinstance(f, In):
        if any(v is None for v in f.value):
            return None  # declined at compile anyway
        hits = [_cmp(val, "eq", v) for v in f.value]
        return True if True in hits else (None if None in hits else False)
    if isinstance(f, StringStartsWith):
        return val.startswith(f.value) if isinstance(val, str) else None
    if isinstance(f, StringEndsWith):
        return val.endswith(f.value) if isinstance(val, str) else None
    if isinstance(f, StringContains):
        return (f.value in val) if isinstance(val, str) else None
    raise AssertionError(f)


def _batch(kind, vals):
    t = {
        "num": pa.float64(),
        "str": pa.string(),
        "date": pa.date32(),
    }[kind]
    return pa.RecordBatch.from_arrays(
        [pa.array(vals, type=t)], names=["c"]
    )


@settings(max_examples=400, deadline=None)
@given(col=column(), data=st.data())
def test_compile_and_refute_sound(col, data):
    kind, vals = col
    f = data.draw(predicate(kind))
    batch = _batch(kind, vals)
    # NaN floats arrive as VALUES in the arrow array (pa.array keeps
    # them); the accumulator treats them as null-on-disk — mirror
    # that in the truth by mapping NaN -> None for match purposes
    # (the readers never emit NaN: sentinels decode to null)
    norm = [
        None
        if v is None or (isinstance(v, float) and math.isnan(v))
        else v
        for v in vals
    ]
    fn = _compile(f)
    truth = [_ev(f, v) for v in norm]
    if fn is not None:
        try:
            mask = fn(batch)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            mask = None  # incomparable operand type: Arrow refuses loudly
        if mask is not None:
            got = [
                bool(mask[i].as_py()) if mask[i].is_valid else None
                for i in range(len(vals))
            ]
            # NaN rows: arrow comparisons on NaN yield non-null
            # False-ish results; the reader never produces NaN, so
            # only compare rows that are not NaN-valued
            for i, v in enumerate(vals):
                if isinstance(v, float) and math.isnan(v):
                    continue
                assert bool(got[i]) == bool(truth[i]), (
                    f, vals, i, got[i], truth[i],
                )
    # refutation soundness against stats published from THIS data
    acc = ZoneMapStats(["c"], [kind], "")
    acc.add(batch)
    pub = _publishable_cols(acc.stats)
    if pub and _refutes(f, pub):
        matching = [
            i for i, t in enumerate(truth)
            if t is True
            and not (
                isinstance(vals[i], float) and math.isnan(vals[i])
            )
        ]
        assert not matching, (
            f"UNSOUND: {f} refuted by {pub} but rows {matching} of "
            f"{vals} match"
        )


@settings(max_examples=200, deadline=None)
@given(col=column(), data=st.data())
def test_stripe_refutation_sound(col, data):
    """Stripe-level twin of the soundness leg: accumulate the same
    random data with tiny stripes, publish the payload, and assert
    that any span refutation excludes zero matching rows from that
    span."""
    from polars_readstat_spark.sources.filters import _stripes_refute

    kind, vals = col
    f = data.draw(predicate(kind))
    R = data.draw(st.integers(min_value=1, max_value=5))
    acc = ZoneMapStats(["c"], [kind], "", stripe_rows=R)
    acc.add(_batch(kind, vals))
    payload = acc.stripes_payload()
    if payload is None:
        return
    entry = {"stripes": payload}
    norm = [
        None
        if v is None or (isinstance(v, float) and math.isnan(v))
        else v
        for v in vals
    ]
    lo = data.draw(st.integers(min_value=0, max_value=len(vals)))
    hi = data.draw(st.integers(min_value=lo, max_value=len(vals)))
    if _stripes_refute(entry, (lo, hi), [f]):
        matching = [
            i for i in range(lo, hi) if _ev(f, norm[i]) is True
        ]
        assert not matching, (
            f"UNSOUND stripe refutation: {f} over span ({lo},{hi}) "
            f"R={payload['rows']} kept {matching} of {vals}"
        )


@settings(max_examples=300, deadline=None)
@given(col=column(), data=st.data())
def test_bloom_refutation_sound(col, data):
    """Bloom-filter twin of the soundness leg (round 13): accumulate
    the same random torture data with a Bloom accumulator on the
    column, publish the fragment the way publish_stats_manifest does
    (inside the publishable col entry), and assert that whenever
    `_refutes` fires — now possibly on Bloom evidence for Eq /
    EqualNullSafe / In, bare or under Not/OrGroup — zero matching
    rows were excluded. Covers the canon edges the unit tests pin
    (-0.0, NaN, huge ints, date-vs-datetime operands, null in In
    lists) under random composition."""
    kind, vals = col
    f = data.draw(predicate(kind))
    batch = _batch(kind, vals)
    acc = ZoneMapStats(["c"], [kind], "", bloom_cols=("c",))
    acc.add(batch)
    pub = _publishable_cols(acc.stats)
    blooms = acc.bloom_payload()
    if not pub or not blooms:
        return
    for c, bf in blooms.items():
        if c in pub:
            pub[c]["bf"] = bf
    if _refutes(f, pub):
        norm = [
            None
            if v is None or (isinstance(v, float) and math.isnan(v))
            else v
            for v in vals
        ]
        matching = [i for i, v in enumerate(norm) if _ev(f, v) is True]
        assert not matching, (
            f"UNSOUND bloom refutation: {f} refuted by {pub} but rows "
            f"{matching} of {vals} match"
        )
