"""Filter pushdown tests: accepted filters drop rows inside the
Python worker (per Arrow batch) before the JVM transfer; declined
filters stay with Catalyst. End-to-end results must match driverside
recomputation exactly, nulls included (reference P4 batch-wise filter
semantics, __init__.py:657-659)."""

from __future__ import annotations

import os

import pytest

SAV = "/root/reference/crates/polars_readstat_rs/tests/spss/data/sample_large.sav"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(SAV), reason="corpus missing"
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


def test_batch_filter_reader_unit():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        IsNotNull,
        StringStartsWith,
    )

    from polars_readstat_spark.sources.filters import BatchFilterReader
    from polars_readstat_spark.sources.sav.reader import SavReader

    r = BatchFilterReader(SavReader(SAV, {"path": SAV}))
    declined = list(
        r.pushFilters(
            [
                GreaterThan(("mynum",), 0.0),
                IsNotNull(("mychar",)),
                EqualTo(("nested", "attr"), 1),  # unsupported shape
                StringStartsWith(("mychar",), "a"),
            ]
        )
    )
    assert len(declined) == 1 and declined[0].attribute == ("nested", "attr")
    assert len(r._preds) == 3
    total = sum(b.num_rows for p in r.partitions() for b in r.read(p))
    full = sum(
        b.num_rows
        for p in SavReader(SAV, {"path": SAV}).partitions()
        for b in SavReader(SAV, {"path": SAV}).read(p)
    )
    assert 0 < total < full  # rows dropped before the JVM boundary


def test_pushdown_end_to_end_matches(spark):
    from pyspark.sql import functions as F

    df = spark.read.format("readstat").load(SAV)
    base = df.collect()
    flt = df.filter(
        ((F.col("mynum") > 0) & F.col("mychar").startswith("a"))
        | F.col("mynum").isNull()
    )
    got = sorted(map(tuple, flt.collect()))
    exp = sorted(
        tuple(r)
        for r in base
        if (
            (r.mynum is not None and r.mynum > 0
             and (r.mychar or "").startswith("a"))
            or r.mynum is None
        )
    )
    assert got == exp


def test_pushdown_with_in_and_nulls(spark):
    from pyspark.sql import functions as F

    df = spark.read.format("readstat").load(SAV)
    base = df.collect()
    vals = sorted({r.myord for r in base if r.myord is not None})[:2]
    got = df.filter(F.col("myord").isin(vals)).count()
    exp = sum(1 for r in base if r.myord in vals)
    assert got == exp


def test_pushdown_composes_with_compress(spark):
    from pyspark.sql import functions as F

    df = (
        spark.read.format("readstat")
        .option("compress", "true")
        .load(SAV)
    )
    base = df.collect()
    got = df.filter(F.col("mylabl") == 1).count()
    exp = sum(1 for r in base if r.mylabl == 1)
    assert got == exp


def test_null_valued_filters_declined():
    """EqualNullSafe(col, None) and In containing None have SQL
    semantics pyarrow kernels don't reproduce (all-true mask /
    null-matching is_in) — _compile must decline them so Catalyst
    evaluates them above the scan."""
    from pyspark.sql.datasource import EqualNullSafe, EqualTo, In

    from polars_readstat_spark.sources.filters import _compile

    assert _compile(EqualNullSafe(("mynum",), None)) is None
    assert _compile(In(("mynum",), (1.0, None))) is None
    # the non-null shapes stay accepted
    assert _compile(EqualNullSafe(("mynum",), 1.0)) is not None
    assert _compile(In(("mynum",), (1.0, 2.0))) is not None
    assert _compile(EqualTo(("mynum",), 1.0)) is not None


def test_equal_null_safe_non_null_semantics():
    """col <=> v : null rows yield FALSE (kept out), non-null compare
    normally — verified against a batch with a null."""
    import pyarrow as pa
    from pyspark.sql.datasource import EqualNullSafe

    from polars_readstat_spark.sources.filters import _compile

    fn = _compile(EqualNullSafe(("x",), 1.0))
    batch = pa.record_batch({"x": pa.array([1.0, 2.0, None])})
    assert fn(batch).to_pylist() == [True, False, False]


def test_pushdown_engages_through_registered_path(spark, tmp_path):
    """Regression (r11): reader() runs in the plan-worker where
    getActiveSession() is None, so a live conf sniff silently
    disabled pushdown for every registered session. With the conf
    baked at register() time, an opted-in session must show
    PushedFilters on the BatchScan node. ALSO pins the upstream
    Spark 4.1 reuse hazard that keeps pushdown opt-in: a filterless
    action on the SAME DataFrame reuses the last pushed plan (when
    this assertion starts failing, Spark fixed the cache — flip the
    default back on in session.py)."""
    import contextlib
    import io

    import pandas as pd

    import polars_readstat_spark as prs

    p = str(tmp_path / "fp.dta")
    pd.DataFrame({"a": range(200)}).to_stata(
        p, write_index=False, version=118
    )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    prs.register(spark)  # re-snapshot the conf
    try:
        df = spark.read.format("readstat").load(p).filter("a >= 150")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PushedFilters" in plan, plan
        assert sorted(r.a for r in df.collect()) == list(range(150, 200))
        # fresh relations are always correct under pushdown
        assert spark.read.format("readstat").load(p).count() == 200
        # the upstream reuse hazard (why the conf is opt-in): the
        # SAME DataFrame's filterless action reuses the pushed plan
        shared = spark.read.format("readstat").load(p)
        assert shared.filter("a >= 150").count() == 50
        assert shared.count() == 50  # Spark 4.1 leak; 200 once fixed
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        prs.register(spark)


def test_plan_reuse_hazard_version_gate(monkeypatch):
    """The pushdown default is gated on the Spark pushed-plan reuse
    bug: EVERY version is hazardous until a release is VERIFIED fixed
    (review r12 — assuming 4.2+ fixed it would auto-enable a
    wrong-results default on speculation). Once _PUSHDOWN_FIXED_MIN
    is recorded, versions at/above it auto-enable; unparsable
    versions stay hazardous."""
    from polars_readstat_spark.sources import filters

    # no verified fix recorded: everything hazardous
    assert filters._PUSHDOWN_FIXED_MIN is None
    for v in ("4.0.0", "4.1.2", "4.2.0", "5.0.0", "weird"):
        assert filters.plan_reuse_hazard(v)
    # the day a fixed release ships: record it and the gate opens
    monkeypatch.setattr(filters, "_PUSHDOWN_FIXED_MIN", (4, 2))
    assert filters.plan_reuse_hazard("4.1.2")
    assert filters.plan_reuse_hazard("4.1.3-SNAPSHOT")
    assert filters.plan_reuse_hazard("3.5.1")
    assert not filters.plan_reuse_hazard("4.2.0")
    assert not filters.plan_reuse_hazard("5.0.0")
    assert filters.plan_reuse_hazard("weird")


def test_register_warns_on_hazardous_opt_in(spark, tmp_path):
    """Opting in on a hazardous Spark version must emit a visible
    warning about the shared-DataFrame pattern (ADVICE r11 medium);
    with the conf unset on the same version, no warning and the baked
    default stays off."""
    import warnings

    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.filters import plan_reuse_hazard

    if not plan_reuse_hazard(spark.version):
        pytest.skip("running Spark has the plan-cache fix")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            prs.register(spark)
        assert any("SHARED DataFrame" in str(x.message) for x in w)
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        prs.register(spark)
    assert not [x for x in w if "DataFrame" in str(x.message)]
    # conf stays unset on a hazardous version (no silent auto-flip)
    assert spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", None
    ) is None


def test_not_in_drops_null_rows_kleene(spark, tmp_path):
    """Regression (found by the r13 where-grammar property fuzz, but
    the hazard is in the shared compile layer Catalyst pushdown uses
    too): pc.is_in yields non-null FALSE for null inputs, so
    Not(In(...)) inverted it to TRUE and resurrected null rows. SQL:
    NULL IN (...) is NULL, NOT NULL is NULL → dropped."""
    import polars_readstat_spark as prs

    prs.register(spark)
    src = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id int, v double"
    )
    p = str(tmp_path / "n.dta")
    prs.write_readstat(src, p)
    df = (
        spark.read.format("readstat")
        .option("where", "v NOT IN (1, 99)")
        .load(p)
    )
    assert [int(r.id) for r in df.collect()] == [3]  # null row dropped
    # plain In still drops nulls too
    df2 = (
        spark.read.format("readstat")
        .option("where", "v IN (1, 3)")
        .load(p)
    )
    assert sorted(int(r.id) for r in df2.collect()) == [1, 3]
