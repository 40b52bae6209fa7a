"""The explicit `where` reader option (round 13): batch-side
filtering + zone-map file skipping with filter pushdown OFF — the
hazard-free path for default sessions (the Spark 4.1 pushed-plan
reuse bug only affects Catalyst-pushed plans; a reader option is part
of the relation identity and can't leak across queries)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    Not,
)

from polars_readstat_spark.sources.filters import parse_where


# ---------------------------------------------------------------- parser

def test_parse_comparisons():
    assert parse_where("a = 5") == [EqualTo(("a",), 5)]
    assert parse_where("a == 5") == [EqualTo(("a",), 5)]
    assert parse_where("a != 5") == [Not(EqualTo(("a",), 5))]
    assert parse_where("a <> 5") == [Not(EqualTo(("a",), 5))]
    assert parse_where("a >= 5.5") == [GreaterThanOrEqual(("a",), 5.5)]
    assert parse_where("a < 1e2") == [LessThan(("a",), 100.0)]


def test_parse_int_stays_int():
    (f,) = parse_where("a = 5")
    assert isinstance(f.value, int)
    (f,) = parse_where("a = 5.0")
    assert isinstance(f.value, float)


def test_parse_strings_and_escapes():
    assert parse_where("s = 'x''y'") == [EqualTo(("s",), "x'y")]
    assert parse_where("s = ''") == [EqualTo(("s",), "")]


def test_parse_in_not_null_and_conjunction():
    got = parse_where(
        "a IN (1, 2) AND b NOT IN ('x') AND c IS NULL AND d is not null"
    )
    assert got == [
        In(("a",), (1, 2)),
        Not(In(("b",), ("x",))),
        IsNull(("c",)),
        IsNotNull(("d",)),
    ]


def test_parse_not_prefix_and_booleans():
    assert parse_where("NOT a > 3") == [Not(__import__(
        "pyspark.sql.datasource", fromlist=["GreaterThan"]
    ).GreaterThan(("a",), 3))]
    assert parse_where("flag = TRUE and flag2 = false") == [
        EqualTo(("flag",), True),
        EqualTo(("flag2",), False),
    ]


def test_parse_backtick_column():
    assert parse_where("`weird name` = 1") == [EqualTo(("weird name",), 1)]


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "a = 5 OR b = 6",
        "a LIKE 'a_b'",
        "a LIKE 'a%b'",
        "a LIKE '%%'",
        "a = ",
        "a = NULL",
        "a BETWEEN 1",
        "a BETWEEN 1 AND",
        "a IN ()",
        "5 = a",
        "a = b",  # column-to-column: rhs must be a literal
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_where(bad)


def test_parse_like_anchored_shapes():
    from pyspark.sql.datasource import (
        StringContains,
        StringEndsWith,
        StringStartsWith,
    )

    assert parse_where("s LIKE 'ab%'") == [StringStartsWith(("s",), "ab")]
    assert parse_where("s LIKE '%ab'") == [StringEndsWith(("s",), "ab")]
    assert parse_where("s LIKE '%ab%'") == [StringContains(("s",), "ab")]
    assert parse_where("s LIKE 'ab'") == [EqualTo(("s",), "ab")]
    assert parse_where("s NOT LIKE 'ab%'") == [
        Not(StringStartsWith(("s",), "ab"))
    ]


def test_like_scan_end_to_end(spark, sink_dir):
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("where", "src LIKE 's0%' AND id < 3")
        .load(sink_dir)
    )
    assert sorted(r.id for r in df.collect()) == [0, 1, 2]
    # prefix refutation prunes: src ranges are s00..s03 per part
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    ds = ReadstatDataSource({"path": sink_dir, "where": "src LIKE 's03%'"})
    r = ds.reader(ds._schema_uncompressed())
    ds0 = ReadstatDataSource({"path": sink_dir})
    r0 = ds0.reader(ds0._schema_uncompressed())
    assert len(list(r.partitions())) < len(list(r0.partitions()))


def test_parse_between():
    from pyspark.sql.datasource import LessThanOrEqual

    from polars_readstat_spark.sources.filters import OrGroup

    assert parse_where("a BETWEEN 3 AND 9") == [
        GreaterThanOrEqual(("a",), 3),
        LessThanOrEqual(("a",), 9),
    ]
    want_neg = [
        OrGroup(
            (
                Not(GreaterThanOrEqual(("a",), 3)),
                Not(LessThanOrEqual(("a",), 9)),
            )
        )
    ]
    assert parse_where("a NOT BETWEEN 3 AND 9") == want_neg
    assert parse_where("NOT a BETWEEN 3 AND 9") == want_neg
    import datetime as dt

    got = parse_where(
        "d BETWEEN DATE '1994-01-01' AND DATE '1994-06-30'"
    )
    assert got[0].value == dt.date(1994, 1, 1)
    with pytest.raises(ValueError):
        parse_where("(a BETWEEN 1 AND 2 OR b = 1)")


def test_between_scan_end_to_end(spark, sink_dir):
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("where", "id BETWEEN 100 AND 110")
        .load(sink_dir)
    )
    assert sorted(r.id for r in df.collect()) == list(range(100, 111))
    df2 = (
        spark.read.format("readstat")
        .option("where", "id NOT BETWEEN 5 AND 3994")
        .load(sink_dir)
    )
    assert sorted(r.id for r in df2.collect()) == list(range(5)) + list(
        range(3995, 4000)
    )


def test_parse_or_groups():
    from pyspark.sql.datasource import GreaterThan, LessThan

    from polars_readstat_spark.sources.filters import OrGroup

    assert parse_where("(a < 5 OR a > 100) AND b = 2") == [
        OrGroup((LessThan(("a",), 5), GreaterThan(("a",), 100))),
        EqualTo(("b",), 2),
    ]
    # NOT of a group expands by De Morgan into negated conjuncts
    assert parse_where("NOT (a = 1 OR a = 2)") == [
        Not(EqualTo(("a",), 1)),
        Not(EqualTo(("a",), 2)),
    ]
    # single-predicate parens collapse; top-level OR still requires
    # parentheses; AND inside a group is rejected
    assert parse_where("(a = 1)") == [EqualTo(("a",), 1)]
    for bad in ("a = 1 OR b = 2", "(a = 1 AND b = 2)", "(a = 1 OR)"):
        with pytest.raises(ValueError):
            parse_where(bad)


def test_or_group_compile_refute_and_scan(spark, tmp_path):
    """OrGroup end-to-end: batch apply (Kleene OR), zone-map
    refutation (all disjuncts must be refuted), and a real scan."""
    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.filters import (
        OrGroup,
        _compile,
        _refutes,
    )

    g = OrGroup((LessThan(("id",), 5), GreaterThanOrEqual(("id",), 3990)))
    assert _compile(g) is not None
    assert _refutes(g, {"id": {"min": 1000, "max": 2000, "nn": 1, "n": 1}})
    assert not _refutes(g, {"id": {"min": 0, "max": 2000, "nn": 1, "n": 1}})
    prs.register(spark)
    d = str(tmp_path / "orx")
    (
        spark.range(4000)
        .selectExpr("cast(id as long) as id")
        .repartitionByRange(4, "id")
        .write.format("readstat")
        .option("format", "dta")
        .mode("overwrite")
        .save(d)
    )
    df = (
        spark.read.format("readstat")
        .option("where", "(id < 5 OR id >= 3990)")
        .load(d)
    )
    got = sorted(r.id for r in df.collect())
    assert got == list(range(5)) + list(range(3990, 4000))
    # middle part-files are refuted by BOTH disjuncts and pruned
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    ds = ReadstatDataSource({"path": d, "where": "(id < 5 OR id >= 3990)"})
    r = ds.reader(ds._schema_uncompressed())
    ds0 = ReadstatDataSource({"path": d})
    r0 = ds0.reader(ds0._schema_uncompressed())
    assert len(list(r.partitions())) < len(list(r0.partitions()))


def test_parse_unknown_column_against_schema():
    with pytest.raises(ValueError, match="unknown column"):
        parse_where("nope = 1", columns={"id", "v"})
    parse_where("id = 1", columns={"id", "v"})  # known: no raise


def test_every_parsed_shape_compiles_and_refutes_safely():
    from polars_readstat_spark.sources.filters import _compile, _refutes

    fs = parse_where(
        "a = 1 AND a != 2 AND a < 3 AND a <= 4 AND a > 5 AND a >= 6 "
        "AND a IN (7, 8) AND a NOT IN (9) AND a IS NULL AND "
        "a IS NOT NULL AND NOT a = 10 AND s = 'x'"
    )
    for f in fs:
        assert _compile(f) is not None
        # refutation must never crash on arbitrary stats shapes
        _refutes(f, {"a": {"min": 0, "max": 1, "nn": 1, "n": 1}})
        _refutes(f, {})


# ------------------------------------------------------------ end-to-end

@pytest.fixture(scope="module")
def sink_dir(spark, tmp_path_factory):
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path_factory.mktemp("whereopt") / "out")
    sdf = spark.range(4000).selectExpr(
        "cast(id as long) as id",
        "cast(id * 0.5 as double) as v",
        "concat('s', lpad(cast(cast(id / 1000 as int) as string), 2, "
        "'0')) as src",
    )
    (
        sdf.repartitionByRange(4, "id")
        .write.format("readstat")
        .option("format", "dta")
        .mode("overwrite")
        .save(d)
    )
    return d


def test_where_filters_rows_pushdown_off(spark, sink_dir):
    import polars_readstat_spark as prs

    prs.register(spark)
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        != "true"
    )
    df = (
        spark.read.format("readstat")
        .option("where", "id >= 1000 AND id < 1100 AND src = 's01'")
        .load(sink_dir)
    )
    got = sorted(r.id for r in df.select("id").collect())
    assert got == list(range(1000, 1100))


def test_where_prunes_files_from_manifest(sink_dir):
    """Plan-level check: with pushdown OFF, the where option alone
    loads the manifest and drops refuted part-files."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    assert os.path.exists(os.path.join(sink_dir, "_prs_stats.json"))

    def parts(opts):
        ds = ReadstatDataSource(opts)
        r = ds.reader(ds._schema_uncompressed())
        return r, list(r.partitions())

    _, all_parts = parts({"path": sink_dir})
    r, pruned = parts({"path": sink_dir, "where": "id > 2999"})
    assert len(pruned) < len(all_parts)
    rows = []
    for p in pruned:
        for b in r.read(p):
            rows.extend(b.column(0).to_pylist())
    assert sorted(rows) == list(range(3000, 4000))


def test_where_string_equality_prunes(sink_dir):
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    def parts(opts):
        ds = ReadstatDataSource(opts)
        r = ds.reader(ds._schema_uncompressed())
        return r, list(r.partitions())

    _, all_parts = parts({"path": sink_dir})
    r, pruned = parts({"path": sink_dir, "where": "src = 's03'"})
    assert len(pruned) < len(all_parts)
    rows = []
    for p in pruned:
        for b in r.read(p):
            rows.extend(b.column(b.schema.get_field_index("id")).to_pylist())
    assert sorted(rows) == list(range(3000, 4000))


def test_where_stale_manifest_costs_skip_not_rows(spark, sink_dir, tmp_path):
    """Same safety property as pushdown: a refuted-but-stale entry is
    read anyway, and the batch-side filter still drops its rows."""
    import shutil

    d = str(tmp_path / "stale")
    shutil.copytree(sink_dir, d)
    mp = os.path.join(d, "_prs_stats.json")
    m = json.load(open(mp))
    for e in m["files"].values():
        e["size"] = e["size"] + 1  # every entry stale
    with open(mp, "w") as f:
        json.dump(m, f)
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("where", "id > 2999")
        .load(d)
    )
    assert df.count() == 1000


def test_where_unknown_column_errors(spark, sink_dir):
    import polars_readstat_spark as prs

    prs.register(spark)
    df = spark.read.format("readstat").option("where", "nope = 1")
    with pytest.raises(Exception, match="unknown column"):
        df.load(sink_dir).count()


def test_where_composes_with_df_filter(spark, sink_dir):
    import polars_readstat_spark as prs
    from pyspark.sql import functions as F

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("where", "id >= 2000")
        .load(sink_dir)
        .filter(F.col("id") < 2010)
    )
    assert sorted(r.id for r in df.collect()) == list(range(2000, 2010))


def test_where_accepted_on_stream(sink_dir):
    """Round 13: the stream takes the option too — parsed (and
    validated against the stream schema) at stream-reader
    construction; end-to-end semantics are pinned in
    tests/test_stream_ingest.py::test_stream_where_option_*."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    ds = ReadstatDataSource({"path": sink_dir, "where": "id > 5"})
    r = ds.streamReader(ds._schema_uncompressed())
    assert r._where is not None
    with pytest.raises(ValueError, match="unknown column"):
        ReadstatDataSource(
            {"path": sink_dir, "where": "nope > 5"}
        ).streamReader(ds._schema_uncompressed())


def test_where_null_semantics(spark, tmp_path):
    """SQL comparison semantics: null rows never match, and
    IS NULL / IS NOT NULL work."""
    import polars_readstat_spark as prs

    prs.register(spark)
    src = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id int, v double"
    )
    p = str(tmp_path / "n.dta")
    prs.write_readstat(src, p)
    load = lambda w: (  # noqa: E731
        spark.read.format("readstat").option("where", w).load(p)
    )
    assert [r.id for r in load("v > 0").collect()] == [1, 3]
    assert [r.id for r in load("v IS NULL").collect()] == [2]
    assert [r.id for r in load("NOT v = 1").collect()] == [3]  # Kleene
    assert [r.id for r in load("v IS NOT NULL").collect()] == [1, 3]


def test_where_on_projected_away_column(spark, sink_dir):
    """A `columns` projection that omits a where-referenced column:
    the scan widens internally, filters, and drops the extra — the
    output schema is exactly the user's projection (round 13)."""
    import polars_readstat_spark as prs

    prs.register(spark)
    df = (
        spark.read.format("readstat")
        .option("columns", "v")
        .option("where", "id >= 1000 AND id < 1010")
        .load(sink_dir)
    )
    assert df.columns == ["v"]
    got = sorted(r.v for r in df.collect())
    assert got == [i * 0.5 for i in range(1000, 1010)]
    # projection + filter on the SAME column still works
    df2 = (
        spark.read.format("readstat")
        .option("columns", "id,v")
        .option("where", "id = 42")
        .load(sink_dir)
    )
    assert df2.columns == ["id", "v"] and df2.count() == 1
    # unknown where column under a projection: loud, names the file's
    # real columns
    bad = (
        spark.read.format("readstat")
        .option("columns", "v")
        .option("where", "nope = 1")
        .load(sink_dir)
    )
    with pytest.raises(Exception, match="unknown columns"):
        bad.count()


def test_where_compress_interplay(spark, tmp_path):
    """where + compress: the filter wraps the COMPRESSED output
    domain; type coercion keeps zone-map refutation safe (downcast
    numerics compare equal; string→numeric parse leaves string stats
    that numeric operands never coerce against)."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path / "cz")
    (
        spark.range(2000)
        .selectExpr(
            "cast(id as double) as id",
            "cast(cast(id % 50 as int) as double) as small",
        )
        .repartitionByRange(2, "id")
        .write.format("readstat")
        .option("format", "dta")
        .mode("overwrite")
        .save(d)
    )
    df = (
        spark.read.format("readstat")
        .option("compress", "true")
        .option("where", "id >= 1500 AND small = 7")
        .load(d)
    )
    got = sorted(r.id for r in df.collect())
    assert got == [float(i) for i in range(1500, 2000) if i % 50 == 7]


def test_where_prunes_across_nested_directories(spark, tmp_path):
    """Round 13: a glob over a date-partitioned nested lake — each
    subdirectory carries its own sink manifest; pruning works across
    all of them."""
    import polars_readstat_spark as prs

    prs.register(spark)
    root = str(tmp_path / "lake")
    for i, sub in enumerate(["m01", "m02", "m03"]):
        (
            spark.range(i * 1000, (i + 1) * 1000)
            .selectExpr("cast(id as long) as id")
            .coalesce(1)
            .write.format("readstat")
            .option("format", "dta")
            .mode("overwrite")
            .save(os.path.join(root, sub))
        )
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    glob = os.path.join(root, "m0*", "*.dta")

    def parts(where=None):
        opts = {"path": glob}
        if where:
            opts["where"] = where
        ds = ReadstatDataSource(opts)
        r = ds.reader(ds._schema_uncompressed())
        return r, list(r.partitions())

    r0, full = parts()
    r, pruned = parts("id >= 2200")
    assert len(pruned) < len(full)
    rows = []
    for p in pruned:
        for b in r.read(p):
            idx = b.schema.names.index("id")
            rows.extend(b.column(idx).to_pylist())
    assert sorted(rows) == list(range(2200, 3000))


def test_where_composes_with_pushdown_session(spark, sink_dir):
    """All three filter layers stacked: the where option (inner),
    Catalyst pushFilters (outer, opted in), and a residual Catalyst
    filter — fresh relation per action, the safe pattern under the
    4.1 plan-reuse hazard."""
    import warnings

    import polars_readstat_spark as prs
    from pyspark.sql import functions as F

    key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        prs.register(spark)
    try:
        df = (
            spark.read.format("readstat")
            .option("where", "id >= 1000 AND id < 3000")
            .load(sink_dir)
            .filter(F.col("src") == "s01")  # pushed to the reader
            .filter(F.col("id") % 10 == 0)  # residual, Catalyst-side
        )
        got = sorted(r.id for r in df.collect())
        assert got == [i for i in range(1000, 2000) if i % 10 == 0]
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            prs.register(spark)
