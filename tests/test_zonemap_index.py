"""index_zonemaps (round 13): build _prs_stats.json for EXISTING
lakes by reading them — manifests for directories our sink never
wrote (SAS/Stata/SPSS-authored files, externally landed extracts).
Reader-output stats are the output domain by construction; the
label-rewrite hazard (value_labels_as_strings remaps labeled STRING
values) is guarded at scan time by disabling string-stat refutation
whenever a label-applying option is active."""

from __future__ import annotations

import json
import os

import pytest

from polars_readstat_spark.sources.zonemap_index import index_zonemaps


def _pandas_dta_dir(tmp_path, nfiles=3, rows=3000):
    """Files written by pandas (NOT our sink): no manifest exists."""
    import numpy as np
    import pandas as pd

    d = str(tmp_path / "lake")
    os.makedirs(d)
    for i in range(nfiles):
        lo = i * rows
        pdf = pd.DataFrame(
            {
                "id": np.arange(lo, lo + rows, dtype="int64"),
                "v": np.arange(lo, lo + rows, dtype="float64") * 0.5,
                "s": [f"grp{i}"] * rows,
            }
        )
        pdf.to_stata(
            os.path.join(d, f"part-{i}.dta"), write_index=False,
            version=118,
        )
    return d


def test_index_builds_manifest_and_prunes(spark, tmp_path):
    import polars_readstat_spark as prs

    prs.register(spark)
    d = _pandas_dta_dir(tmp_path)
    assert not os.path.exists(os.path.join(d, "_prs_stats.json"))
    indexed = index_zonemaps(spark, d, stripe_rows=1024)
    assert len(indexed) == 3 and all(n == 3000 for n in indexed.values())
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    assert len(m["files"]) == 3
    e0 = m["files"]["part-0.dta"]
    assert e0["cols"]["id"]["min"] == 0 and e0["cols"]["id"]["max"] == 2999
    assert e0["cols"]["s"]["min"] == "grp0"
    assert len(e0["stripes"]["cols"]) == 3  # 3000 rows / 1024
    # the indexed manifest actually prunes a scan
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    def parts(where=None):
        opts = {"path": d}
        if where:
            opts["where"] = where
        ds = ReadstatDataSource(opts)
        r = ds.reader(ds._schema_uncompressed())
        return r, [p for p in r.partitions()]

    r0, full = parts()
    r1, pruned = parts("id >= 7000")
    assert len(pruned) < len(full)
    rows = []
    for p in pruned:
        for b in r1.read(p):
            idx = b.schema.names.index("id")
            rows.extend(b.column(idx).to_pylist())
    assert sorted(rows) == list(range(7000, 9000))


def test_index_incremental_only_new_files(spark, tmp_path):
    import pandas as pd

    d = _pandas_dta_dir(tmp_path)
    first = index_zonemaps(spark, d)
    assert len(first) == 3
    again = index_zonemaps(spark, d)
    assert again == {}  # everything covered with current size+mtime
    pd.DataFrame({"id": [90000], "v": [1.0], "s": ["new"]}).to_stata(
        os.path.join(d, "part-9.dta"), write_index=False, version=118
    )
    third = index_zonemaps(spark, d)
    assert list(third) == [os.path.join(d, "part-9.dta")]
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    assert len(m["files"]) == 4


def test_index_refresh_reindexes_all(spark, tmp_path):
    d = _pandas_dta_dir(tmp_path, nfiles=2)
    index_zonemaps(spark, d)
    assert len(index_zonemaps(spark, d, refresh=True)) == 2


def test_index_skips_unreadable_file(spark, tmp_path):
    d = _pandas_dta_dir(tmp_path, nfiles=2)
    bad = os.path.join(d, "broken.dta")
    with open(bad, "wb") as f:
        f.write(b"not a stata file at all")
    indexed = index_zonemaps(spark, d)
    assert len(indexed) == 2  # the two good files; broken skipped
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    assert "broken.dta" not in m["files"]


def test_index_date_columns_tagged(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    d = str(tmp_path / "dl")
    os.makedirs(d)
    pdf = pd.DataFrame(
        {
            "id": range(100),
            "d": [dt.date(2020, 1, 1) + dt.timedelta(days=i) for i in range(100)],
        }
    )
    pdf["d"] = pd.to_datetime(pdf["d"])
    pdf.to_stata(
        os.path.join(d, "a.dta"), write_index=False, version=118,
        convert_dates={"d": "td"},
    )
    index_zonemaps(spark, d)
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    c = m["files"]["a.dta"]["cols"]["d"]
    assert c["t"] == "date"
    assert c["min"] == (dt.date(2020, 1, 1) - dt.date(1970, 1, 1)).days


# ------------------------------------------------ label-rewrite guard

def test_string_refutation_disabled_under_label_options():
    from pyspark.sql.datasource import EqualTo, Not

    from polars_readstat_spark.sources.filters import _refutes

    cols = {"s": {"min": "a", "max": "b", "nn": 5, "n": 5}}
    f = EqualTo(("s",), "Apple")
    assert _refutes(f, cols)  # default: range refutes
    assert not _refutes(f, cols, str_ok=False)  # labels active: never
    const = {"s": {"min": "a", "max": "a", "nn": 5, "n": 5}}
    assert _refutes(Not(EqualTo(("s",), "a")), const)
    assert not _refutes(Not(EqualTo(("s",), "a")), const, str_ok=False)
    # numeric and date stats stay live either way
    num = {"v": {"min": 0, "max": 9, "nn": 5, "n": 5}}
    assert _refutes(EqualTo(("v",), 99), num, str_ok=False)


def test_label_scan_plans_full_file_set(spark, tmp_path):
    """Plan-level: with value_labels_as_strings on, a string predicate
    must NOT skip files (the labeled output domain is unknowable from
    the stats); with it off, the same predicate prunes."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path / "lk")
    (
        spark.range(4000)
        .selectExpr(
            "cast(id as long) as id",
            "concat('k', lpad(cast(cast(id / 1000 as int) as string), "
            "2, '0')) as s",
        )
        .repartitionByRange(4, "s")
        .write.format("readstat")
        .option("format", "dta")
        .mode("overwrite")
        .save(d)
    )
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    def nparts(opts):
        ds = ReadstatDataSource({"path": d, "where": "s = 'k03'", **opts})
        r = ds.reader(ds._schema_uncompressed())
        return len(list(r.partitions()))

    pruned = nparts({})
    unpruned = nparts({"value_labels_as_strings": "true"})
    assert pruned < unpruned


@pytest.mark.parametrize("fmt", ["sav", "xpt", "sas7bdat"])
def test_index_other_formats(spark, tmp_path, fmt):
    """index_zonemaps over non-dta lakes: stats keyed by the READER's
    column names (xpt: uppercase shorts) and prune a where-scan."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path / fmt)
    (
        spark.range(6000)
        .selectExpr("cast(id as double) as id")
        .repartitionByRange(3, "id")
        .write.format("readstat")
        .option("format", fmt)
        .mode("overwrite")
        .save(d)
    )
    os.unlink(os.path.join(d, "_prs_stats.json"))  # external-lake shape
    indexed = index_zonemaps(spark, d, stripe_rows=1024)
    assert len(indexed) == 3
    col = "id" if fmt != "xpt" else "ID"
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    assert all(col in e["cols"] for e in m["files"].values())
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    def nparts(where=None):
        opts = {"path": d}
        if where:
            opts["where"] = where
        ds = ReadstatDataSource(opts)
        r = ds.reader(ds._schema_uncompressed())
        return r, list(r.partitions())

    _, full = nparts()
    r, pruned = nparts(f"{col} >= 4000")
    assert len(pruned) < len(full)
    rows = []
    for p in pruned:
        for b in r.read(p):
            idx = b.schema.names.index(col)
            rows.extend(b.column(idx).to_pylist())
    assert sorted(rows) == [float(i) for i in range(4000, 6000)]


def test_union_float_widening_scrubs_int_stats(spark, tmp_path):
    """Soundness (round 13 review): union_by_name widening int→double
    rounds values past 2^53, so INT-valued stats from an
    integer-typed file must not refute over the widened output. The
    scrub drops exactly those entries; the same predicate still
    prunes when the scan is NOT widened."""
    import numpy as np
    import pandas as pd

    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path / "mix")
    os.makedirs(d)
    # file A: int32 column (stats publish as ints via index_zonemaps)
    pd.DataFrame({"x": np.arange(0, 1000, dtype="int32")}).to_stata(
        os.path.join(d, "a.dta"), write_index=False, version=118
    )
    # file B: float column, same name → union widens x to double
    pd.DataFrame(
        {"x": np.arange(5000, 6000, dtype="float64")}
    ).to_stata(os.path.join(d, "b.dta"), write_index=False, version=118)
    index_zonemaps(spark, d)
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    assert isinstance(m["files"]["a.dta"]["cols"]["x"]["min"], int)
    assert isinstance(m["files"]["b.dta"]["cols"]["x"]["min"], float)

    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    def nparts(opts):
        ds = ReadstatDataSource({"path": d, "where": "x >= 5000", **opts})
        r = ds.reader(ds._schema_uncompressed())
        return len(list(r.partitions()))

    # widened union: file A's int stats are scrubbed → A not pruned
    # (its refutation would rest on pre-cast integers); B's float
    # stats stay live — and the row set is still exact
    ds = ReadstatDataSource(
        {"path": d, "where": "x >= 5000", "union_by_name": "true"}
    )
    r = ds.reader(ds._schema_uncompressed())
    parts = list(r.partitions())
    rows = []
    for p in parts:
        for b in r.read(p):
            idx = b.schema.names.index("x")
            rows.extend(b.column(idx).to_pylist())
    assert sorted(rows) == [float(i) for i in range(5000, 6000)]
    # non-union scan of the int file alone: int stats still prune
    ds2 = ReadstatDataSource(
        {"path": os.path.join(d, "a.dta"), "where": "x >= 5000"}
    )
    r2 = ds2.reader(ds2._schema_uncompressed())
    p2 = list(r2.partitions())
    assert sum(getattr(p, "n", 0) for p in p2) < 1000


def test_index_glob_nested_lake(spark, tmp_path):
    """index_zonemaps over a nested-lake glob: one manifest per
    subdirectory, scan-side merge prunes across them."""
    import numpy as np
    import pandas as pd

    root = str(tmp_path / "nested")
    for i, sub in enumerate(["p1", "p2", "p3"]):
        os.makedirs(os.path.join(root, sub))
        pd.DataFrame(
            {"id": np.arange(i * 1000, (i + 1) * 1000, dtype="float64")}
        ).to_stata(
            os.path.join(root, sub, "part.dta"),
            write_index=False,
            version=118,
        )
    indexed = index_zonemaps(spark, os.path.join(root, "p*", "*.dta"))
    assert len(indexed) == 3
    for sub in ("p1", "p2", "p3"):
        m = json.load(
            open(os.path.join(root, sub, "_prs_stats.json"))
        )
        assert len(m["files"]) == 1
    # incremental over the same glob: nothing to do
    assert index_zonemaps(spark, os.path.join(root, "p*", "*.dta")) == {}
    # scan prunes across the per-dir manifests
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    ds = ReadstatDataSource(
        {"path": os.path.join(root, "p*", "*.dta"), "where": "id >= 2500"}
    )
    r = ds.reader(ds._schema_uncompressed())
    parts = list(r.partitions())
    rows = []
    for p in parts:
        for b in r.read(p):
            rows.extend(b.column(0).to_pylist())
    assert sorted(rows) == [float(i) for i in range(2500, 3000)]
    ds0 = ReadstatDataSource({"path": os.path.join(root, "p*", "*.dta")})
    r0 = ds0.reader(ds0._schema_uncompressed())
    assert len(parts) < len(list(r0.partitions()))


def test_explain_scan_reports_pruning(spark, tmp_path):
    """explain_scan: plan-only pruning report — totals shrink under a
    refuting where, per-file rows account for trims, and a
    manifest-less lake reports manifest=False with no pruning."""
    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path / "ex")
    (
        spark.range(8000)
        .selectExpr("cast(id as long) as id")
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id")
        .write.format("readstat")
        .option("format", "dta")
        .option("zonemap_stripe_rows", "512")
        .mode("overwrite")
        .save(d)
    )
    rep = prs.explain_scan(spark, d, where="id >= 7000")
    assert rep["manifest"] is True
    t = rep["totals"]
    assert t["planned_rows"] == 8000
    assert 0 < t["pruned_rows"] < t["planned_rows"] / 2
    assert t["pruned_partitions"] < t["planned_partitions"]
    # per-file: three parts fully refuted, the last kept (trimmed)
    kept = [f for f, e in rep["files"].items() if e["pruned_rows"] > 0]
    assert len(kept) == 1
    # no manifest → no pruning, flagged
    os.unlink(os.path.join(d, "_prs_stats.json"))
    rep2 = prs.explain_scan(spark, d, where="id >= 7000")
    assert rep2["manifest"] is False
    assert rep2["totals"]["pruned_rows"] == rep2["totals"]["planned_rows"]


def test_explain_scan_single_file_no_manifest(spark, tmp_path):
    """Regression (r13 self-review): a single-file plan with neither
    pushdown nor a manifest exposes no paths-bearing layer — the
    report must fall back to the resolved path, not crash."""
    import pandas as pd

    import polars_readstat_spark as prs

    p = str(tmp_path / "one.dta")
    pd.DataFrame({"x": [1.0, 2.0, 3.0]}).to_stata(
        p, write_index=False, version=118
    )
    rep = prs.explain_scan(spark, p)
    assert rep["manifest"] is False
    assert rep["totals"]["planned_rows"] == 3
    rep2 = prs.explain_scan(spark, p, where="x > 99")
    assert rep2["totals"]["pruned_rows"] == 3  # nothing to prune with


def test_check_manifest_tool(spark, tmp_path):
    """tools/check_manifest.py: a clean sink dir validates (incl. the
    --verify-values ground-truth pass); corrupted entries are
    flagged; a drifted data file reads as STALE, not a failure."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.check_manifest import check_manifest

    import polars_readstat_spark as prs

    prs.register(spark)
    d = str(tmp_path / "mc")
    (
        spark.range(3000)
        .selectExpr("cast(id as long) as id")
        .repartitionByRange(2, "id")
        .write.format("readstat")
        .option("format", "dta")
        .option("zonemap_stripe_rows", "512")
        .mode("overwrite")
        .save(d)
    )
    problems, stale, total = check_manifest(d, verify_values=True)
    assert (problems, stale, total) == ([], [], 2)
    # corrupt the manifest: bad n, inverted range, truncated stripes
    mp = os.path.join(d, "_prs_stats.json")
    m = json.load(open(mp))
    k = sorted(m["files"])[0]
    m["files"][k]["n"] += 3
    m["files"][k]["cols"]["id"]["min"] = 10**9
    m["files"][k]["stripes"]["cols"] = m["files"][k]["stripes"]["cols"][:1]
    json.dump(m, open(mp, "w"))
    problems, stale, _ = check_manifest(d)
    assert len(problems) == 3 and not stale
    # drift a data file (append a byte): STALE, not a failure
    m = json.load(open(mp))
    k2 = sorted(m["files"])[1]
    with open(os.path.join(d, k2), "ab") as f:
        f.write(b"x")
    problems2, stale2, _ = check_manifest(d)
    assert any(k2 in s for s in stale2)
