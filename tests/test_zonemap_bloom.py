"""Per-file Bloom-filter skipping (round 13, sources/bloom.py).

Zone-map ranges prune clustered columns; blooms prune POINT predicates
(`key = X`, `key IN (...)`) on UNSORTED columns whose per-file
[min, max] spans the whole domain — the join/lookup-key shape where
range stats are useless. The soundness battery mirrors the zone-map
regime: every refutation is typed by the bloom's own domain tag,
gated by the label-rewrite guard and the manifest freshness check,
and a value the writer can't hash soundly drops the bloom instead of
publishing a false-negative-capable one.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def bloom_dir(spark, tmp_path_factory):
    import polars_readstat_spark as prs

    prs.register(spark)
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("bloom") / "lake")
    # key/name are UNSORTED: every residue appears in every partition,
    # so per-file ranges cover the whole domain and never refute a
    # point predicate — only the bloom can
    df = (
        spark.range(0, 8000)
        .select(
            ((F.col("id") * 7919) % 100).cast("double").alias("key"),
            F.concat(
                F.lit("u"), ((F.col("id") * 13) % 50).cast("string")
            ).alias("name"),
            F.date_add(
                F.lit(datetime.date(2024, 1, 1)),
                ((F.col("id") * 31) % 200).cast("int"),
            ).alias("d"),
        )
        .repartition(4)
    )
    (
        df.write.format("readstat")
        .option("format", "dta")
        .option("zonemap_bloom_columns", "key,name,d")
        .mode("overwrite")
        .save(d)
    )
    return d


def _explain(d, **opts):
    from polars_readstat_spark.operators.scan_explain import explain_scan

    return explain_scan(None, d, **opts)["totals"]


def _kept(d, **opts):
    return _explain(d, **opts)["pruned_partitions"]


def test_bloom_published_inside_col_entries(bloom_dir):
    m = json.load(open(os.path.join(bloom_dir, "_prs_stats.json")))
    for e in m["files"].values():
        for col, dom in (("key", "num"), ("name", "str"), ("d", "date")):
            bf = e["cols"][col]["bf"]
            assert bf["d"] == dom
            assert bf["m"] == 8 * len(
                __import__("base64").b64decode(bf["b"])
            )
            assert bf["m"] & (bf["m"] - 1) == 0 and 1 <= bf["k"] <= 16


def test_point_absent_prunes_point_present_keeps(bloom_dir):
    full = _explain(bloom_dir)["planned_partitions"]
    # 41.5 is inside [0, 99] — ranges keep everything, bloom prunes
    assert _kept(bloom_dir, where="key = 41.5") == 0
    assert _kept(bloom_dir, where="key = 41.0") == full
    # and the kept plan still returns exact rows
    from polars_readstat_spark.sources.datasource import ReadstatDataSource

    ds = ReadstatDataSource({"path": bloom_dir, "where": "key = 41.0"})
    r = ds.reader(ds._schema_uncompressed())
    n = sum(b.num_rows for p in r.partitions() for b in r.read(p))
    assert n == 80  # 8000 rows / 100 residues


def test_int_operand_matches_double_storage(bloom_dir):
    # canon is float64(v): an int operand equal to a stored double
    # must NOT prune (Spark coerces 41 == 41.0 to true)
    assert _kept(bloom_dir, where="key = 41") > 0


def test_in_list_semantics(bloom_dir):
    full = _explain(bloom_dir)["planned_partitions"]
    assert _kept(bloom_dir, where="key IN (41.5, 77.25)") == 0
    # one present value keeps the files
    assert _kept(bloom_dir, where="key IN (41.5, 42.0)") == full


def test_string_bloom(bloom_dir):
    full = _explain(bloom_dir)["planned_partitions"]
    assert _kept(bloom_dir, where="name = 'absent'") == 0
    assert _kept(bloom_dir, where="name = 'u7'") == full
    assert _kept(bloom_dir, where="name IN ('nope', 'u7')") == full


def test_date_bloom_date_operand_only(bloom_dir):
    full = _explain(bloom_dir)["planned_partitions"]
    # dates run 2024-01-01 .. +199d with every offset present; a date
    # past the range is range-refuted, so probe a GAP inside range:
    # none exists (all offsets 0..199 present) → use a present one to
    # assert keep, and rely on unit tests below for absent-date prune
    assert _kept(bloom_dir, where="d = DATE '2024-03-01'") == full


def test_label_guard_disables_string_bloom(bloom_dir):
    # value_labels_as_strings rewrites labeled string values — string
    # bloom evidence must not refute (same str_ok gate as ranges)
    assert (
        _kept(
            bloom_dir,
            where="name = 'absent'",
            value_labels_as_strings="true",
        )
        > 0
    )
    # numeric bloom evidence is unaffected by the label guard
    assert (
        _kept(
            bloom_dir,
            where="key = 41.5",
            value_labels_as_strings="true",
        )
        == 0
    )


def test_stale_manifest_never_prunes(bloom_dir, tmp_path):
    import shutil

    d = str(tmp_path / "stale")
    shutil.copytree(bloom_dir, d)
    # rewrite one part in place (same name, new mtime/size) — its
    # bloom must be distrusted
    parts = sorted(p for p in os.listdir(d) if p.endswith(".dta"))
    with open(os.path.join(d, parts[0]), "ab") as f:
        f.write(b"\x00")
    kept = _kept(d, where="key = 41.5")
    assert kept >= 1  # the touched file survives; fresh ones prune


def test_pushdown_path_uses_blooms(bloom_dir):
    from pyspark.sql.datasource import EqualTo, In

    from polars_readstat_spark.sources.datasource import ReadstatDataSource
    from polars_readstat_spark.sources.filters import BatchFilterReader

    cls = type(
        "ReadstatDataSource",
        (ReadstatDataSource,),
        {"_registered_filter_pushdown": True},
    )
    ds = cls({"path": bloom_dir})
    r = BatchFilterReader(ds.reader(ds._schema_uncompressed()))
    declined = r.pushFilters([EqualTo(("key",), 41.5)])
    assert not list(declined) or True  # acceptance set is its own test
    assert len(list(r.partitions())) == 0
    ds2 = cls({"path": bloom_dir})
    r2 = BatchFilterReader(ds2.reader(ds2._schema_uncompressed()))
    r2.pushFilters([In(("name",), ("absent", "gone"))])
    assert len(list(r2.partitions())) == 0


class TestRefuterUnits:
    """No-Spark unit coverage of _bloom_refutes edge semantics."""

    def _entry(self, values, domain):
        from polars_readstat_spark.sources.bloom import (
            BloomAccumulator,
            canon_num,
            canon_str,
        )

        bl = BloomAccumulator(domain)
        if domain == "str":
            bl.seen = {canon_str(v) for v in values}
        elif domain == "date":
            bl.seen = {v & ((1 << 64) - 1) for v in values}
        else:
            bl.seen = {canon_num(v) for v in values}
        return {"min": None, "max": None, "bf": bl.payload()}

    def _ref(self, f, st, str_ok=True):
        from polars_readstat_spark.sources.filters import _bloom_refutes

        return _bloom_refutes(f, st, str_ok)

    def test_negative_zero_equals_zero(self):
        from pyspark.sql.datasource import EqualTo

        st = self._entry([-0.0], "num")
        assert not self._ref(EqualTo(("c",), 0.0), st)
        assert not self._ref(EqualTo(("c",), 0), st)

    def test_nan_operand_never_refutes(self):
        from pyspark.sql.datasource import EqualTo

        st = self._entry([1.0], "num")
        assert not self._ref(EqualTo(("c",), float("nan")), st)

    def test_null_operand_never_refutes(self):
        from pyspark.sql.datasource import EqualNullSafe, EqualTo, In

        st = self._entry([1.0], "num")
        assert not self._ref(EqualNullSafe(("c",), None), st)
        assert not self._ref(EqualTo(("c",), None), st)
        assert not self._ref(In(("c",), (2.0, None)), st)

    def test_bool_operand_never_refutes(self):
        from pyspark.sql.datasource import EqualTo

        st = self._entry([1.0], "num")
        assert not self._ref(EqualTo(("c",), True), st)

    def test_huge_int_operand_rounds_like_storage(self):
        from pyspark.sql.datasource import EqualTo

        big = (1 << 53) + 1  # float64-rounds to 2^53
        st = self._entry([float(big)], "num")
        assert not self._ref(EqualTo(("c",), big), st)
        assert not self._ref(EqualTo(("c",), 1 << 53), st)
        assert self._ref(EqualTo(("c",), (1 << 53) + 2049), st)

    def test_date_domain_coerces_date_only(self):
        from pyspark.sql.datasource import EqualTo

        day = (datetime.date(2024, 1, 2) - datetime.date(1970, 1, 1)).days
        st = self._entry([day], "date")
        assert not self._ref(EqualTo(("c",), datetime.date(2024, 1, 2)), st)
        assert self._ref(EqualTo(("c",), datetime.date(2024, 1, 3)), st)
        # ints equal to the day number and datetimes never refute
        assert not self._ref(EqualTo(("c",), day + 1), st)
        assert not self._ref(
            EqualTo(("c",), datetime.datetime(2024, 1, 3)), st
        )

    def test_str_ok_gate(self):
        from pyspark.sql.datasource import EqualTo

        st = self._entry(["a"], "str")
        assert self._ref(EqualTo(("c",), "b"), st, str_ok=True)
        assert not self._ref(EqualTo(("c",), "b"), st, str_ok=False)

    def test_corrupt_fragments_never_refute(self):
        from pyspark.sql.datasource import EqualTo

        good = self._entry(["a"], "str")
        f = EqualTo(("c",), "b")
        for mut in (
            {"d": "wat"},
            {"m": 100},  # not a power of two
            {"m": 4},
            {"k": 0},
            {"k": 99},
            {"b": "!!!not-b64!!!"},
            {"b": "AAAA"},  # wrong length vs m
        ):
            st = {"bf": {**{k: v for k, v in good["bf"].items()}, **mut}}
            st["bf"].pop("_bits", None)
            assert not self._ref(f, st)
        assert not self._ref(f, {"bf": "nope"})
        assert not self._ref(f, {})


class TestAccumulatorUnits:
    def test_ndv_cap_drops(self):
        import pyarrow as pa

        from polars_readstat_spark.sources.bloom import BloomAccumulator

        bl = BloomAccumulator("num", max_bytes=64)  # cap ndv = 51
        bl.add_array(pa.array([float(i) for i in range(100)]))
        assert bl.dropped and bl.payload() is None

    def test_unhashable_types_drop(self):
        import decimal

        import pyarrow as pa

        from polars_readstat_spark.sources.bloom import BloomAccumulator

        bl = BloomAccumulator("num")
        bl.add_array(pa.array([decimal.Decimal("1.5")]))
        assert bl.dropped
        b2 = BloomAccumulator("num")
        b2.add_array(pa.array([True, False]))
        assert b2.dropped

    def test_poisoned_column_publishes_no_bloom(self):
        import pyarrow as pa

        from polars_readstat_spark.writers.spark_sink import ZoneMapStats

        acc = ZoneMapStats(["s"], ["str"], "dta", bloom_cols=("s",))
        acc.add(
            pa.RecordBatch.from_pydict(
                {"s": pa.array(["ok", "trailing "])}
            )
        )
        assert acc.bloom_payload() is None

    def test_empty_set_refutes_everything(self):
        from pyspark.sql.datasource import EqualTo

        from polars_readstat_spark.sources.bloom import BloomAccumulator
        from polars_readstat_spark.sources.filters import _bloom_refutes

        bl = BloomAccumulator("num")
        st = {"bf": bl.payload()}
        assert _bloom_refutes(EqualTo(("c",), 5.0), st, True)


def test_union_widening_preserves_numeric_bloom():
    """int-file blooms survive the union-by-name float-widening scrub
    (canon is float64(v) — exactly the widening cast), while int range
    stats are dropped; null accounting survives too."""
    from polars_readstat_spark.sources.datasource import (
        _scrub_union_widened,
    )

    bf = {"k": 7, "m": 64, "b": "AAAAAAAAAAA=", "d": "num"}
    stats = {
        "f.dta": {
            "cols": {
                "x": {"min": 1, "max": 9, "nn": 5, "n": 5, "bf": dict(bf)}
            }
        }
    }
    _scrub_union_widened(stats, {"x"})
    e = stats["f.dta"]["cols"]["x"]
    assert "min" not in e and "max" not in e
    assert e["nn"] == 5 and e["n"] == 5 and e["bf"]["d"] == "num"
    # a str-domain bloom on an int-valued entry is inconsistent —
    # scrubbed with the ranges, never preserved
    stats2 = {
        "f.dta": {
            "cols": {"x": {"min": 1, "max": 9, "bf": {**bf, "d": "str"}}}
        }
    }
    _scrub_union_widened(stats2, {"x"})
    assert "bf" not in stats2["f.dta"]["cols"].get("x", {})


def test_indexer_builds_blooms(spark, bloom_dir, tmp_path):
    """index_zonemaps(bloom_columns=...) publishes blooms for a lake
    whose files our sink wrote but whose manifest we delete — the
    existing-lake path."""
    import shutil

    import polars_readstat_spark as prs

    d = str(tmp_path / "indexed")
    shutil.copytree(bloom_dir, d)
    os.remove(os.path.join(d, "_prs_stats.json"))
    out = prs.index_zonemaps(spark, d, bloom_columns=("key", "name"))
    assert len(out) == 4
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    for e in m["files"].values():
        assert e["cols"]["key"]["bf"]["d"] == "num"
        assert e["cols"]["name"]["bf"]["d"] == "str"
        assert "bf" not in e["cols"]["d"]
    assert _kept(d, where="key = 41.5") == 0
    assert _kept(d, where="key = 41.0") == 4


def test_manifest_is_plan_local_not_shipped(bloom_dir):
    """file_stats (ranges + bloom bit-tables) are plan-time driver
    state; the reader pickled into task binaries must shed them —
    a 64-part bloom manifest is >1 MB of base64 executors never read
    (measured: task binary 1.4 MB -> 25 KB)."""
    from pyspark import cloudpickle

    from polars_readstat_spark.sources.datasource import (
        PlanLocalStats,
        ReadstatDataSource,
    )

    ds = ReadstatDataSource({"path": bloom_dir, "where": "key = 41.0"})
    r = ds.reader(ds._schema_uncompressed())
    r.partitions()
    mf = r
    while mf is not None and not hasattr(mf, "file_stats"):
        mf = getattr(mf, "inner", None)
    assert isinstance(mf.file_stats, PlanLocalStats)
    assert len(mf.file_stats) == 4  # live on the driver
    r2 = cloudpickle.loads(cloudpickle.dumps(r))
    mf2 = r2
    while mf2 is not None and not hasattr(mf2, "file_stats"):
        mf2 = getattr(mf2, "inner", None)
    assert mf2.file_stats == {}  # shed across serialization


def test_vacuum_manifest(bloom_dir, tmp_path):
    """vacuum_manifest drops entries for deleted and in-place-rewritten
    files (correct-but-inert dead weight under merge=True publishing)
    and keeps fresh ones; a second vacuum is a no-op."""
    import shutil

    import polars_readstat_spark as prs

    d = str(tmp_path / "vac")
    shutil.copytree(bloom_dir, d)
    parts = sorted(p for p in os.listdir(d) if p.endswith(".dta"))
    os.remove(os.path.join(d, parts[0]))  # gone
    with open(os.path.join(d, parts[1]), "ab") as f:
        f.write(b"\x00")  # drifted
    r = prs.vacuum_manifest(d)
    assert r == {"kept": 2, "dropped": 2}
    m = json.load(open(os.path.join(d, "_prs_stats.json")))
    assert sorted(m["files"]) == parts[2:]
    assert prs.vacuum_manifest(d) == {"kept": 2, "dropped": 0}
    # the kept entries still prune
    assert _kept(d, where="key = 41.5") == 1  # only the drifted file


def test_bloom_domain_must_match_range_stats():
    """Defense in depth: a hand-made manifest pairing a 'num' bloom
    with a date-tagged (or string-ranged) entry must not refute —
    otherwise an int operand could bloom-refute where the range rules
    say ints never refute date stats."""
    from pyspark.sql.datasource import EqualTo

    from polars_readstat_spark.sources.bloom import BloomAccumulator
    from polars_readstat_spark.sources.filters import _bloom_refutes

    bl = BloomAccumulator("num")
    bl.seen = {123}
    bf = bl.payload()
    # num bloom on a date-tagged entry: int operand never refutes
    st = {"min": 10, "max": 20, "t": "date", "bf": dict(bf)}
    assert not _bloom_refutes(EqualTo(("c",), 5), st, True)
    # num bloom on string-ranged entry
    st2 = {"min": "a", "max": "z", "bf": dict(bf)}
    assert not _bloom_refutes(EqualTo(("c",), 5.0), st2, True)
    # str bloom on numeric-ranged entry
    bf_s = {**bf, "d": "str"}
    st3 = {"min": 1.0, "max": 9.0, "bf": bf_s}
    assert not _bloom_refutes(EqualTo(("c",), "x"), st3, True)
    # consistent pairing still works
    st4 = {"min": 1.0, "max": 9.0, "bf": dict(bf)}
    assert _bloom_refutes(EqualTo(("c",), 5.0), st4, True)
