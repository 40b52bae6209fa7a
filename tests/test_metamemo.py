"""Parsed-metadata memo: hit on identical file state, invalidate on
rewrite, and the wired parsers actually route through it."""

from __future__ import annotations

import os

from polars_readstat_spark.sources import metamemo


def test_memo_hit_and_invalidate(tmp_path):
    p = str(tmp_path / "f.bin")
    with open(p, "wb") as f:
        f.write(b"one")
    calls = []

    def parse(path):
        calls.append(path)
        return {"n": len(calls)}

    a = metamemo.memoized_parse("t", p, parse)
    b = metamemo.memoized_parse("t", p, parse)
    assert a is b and len(calls) == 1
    # rewrite via replace (what the writers do) — new mtime/size
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"three!")
    os.replace(tmp, p)
    c = metamemo.memoized_parse("t", p, parse)
    assert c is not a and len(calls) == 2
    # distinct kinds never share entries
    d = metamemo.memoized_parse("other", p, parse)
    assert d is not c and len(calls) == 3


def test_missing_file_falls_through(tmp_path):
    import pytest

    def parse(path):
        raise FileNotFoundError(path)

    with pytest.raises(FileNotFoundError):
        metamemo.memoized_parse("t", str(tmp_path / "nope"), parse)


def test_dta_parser_memoizes(spark, tmp_path):
    from pyspark.sql import functions as F

    from polars_readstat_spark.sources.dta.meta import parse_dta_meta
    from polars_readstat_spark.writers.dta import write_dta

    p = str(tmp_path / "m.dta")
    write_dta(
        spark.range(100).select(F.col("id").alias("a")), p
    )
    m1 = parse_dta_meta(p)
    m2 = parse_dta_meta(p)
    assert m1 is m2
    # rewrite invalidates
    write_dta(
        spark.range(200).select(F.col("id").alias("a")), p
    )
    m3 = parse_dta_meta(p)
    assert m3 is not m1
    assert m3.nobs == 200


def test_list_parses_frozen_to_tuple(tmp_path):
    """ADVICE r09: the memo hands every caller the same object, so
    list-valued parses are frozen — in-place mutation by a future
    consumer becomes a TypeError instead of silent corruption."""
    p = str(tmp_path / "l.bin")
    with open(p, "wb") as f:
        f.write(b"x")
    got = metamemo.memoized_parse("lst", p, lambda _: [3, 1, 2])
    assert got == (3, 1, 2)
    assert isinstance(got, tuple)
    assert metamemo.memoized_parse("lst", p, lambda _: None) is got


def test_cap_evicts_one_not_all(tmp_path):
    """ADVICE r09: crossing the cap evicts a single (oldest) entry —
    a big directory scan must not drop the whole hot working set."""
    p = str(tmp_path / "e.bin")
    with open(p, "wb") as f:
        f.write(b"x")
    saved = dict(metamemo._MEMO)
    try:
        metamemo._MEMO.clear()
        for i in range(metamemo._MAX_ENTRIES):
            metamemo.memoized_parse(f"k{i}", p, lambda _: i)
        assert len(metamemo._MEMO) == metamemo._MAX_ENTRIES
        metamemo.memoized_parse("overflow", p, lambda _: "new")
        assert len(metamemo._MEMO) == metamemo._MAX_ENTRIES
        # oldest gone, second-oldest and newest present
        kinds = {k[0] for k in metamemo._MEMO}
        assert "k0" not in kinds and "k1" in kinds and "overflow" in kinds
    finally:
        metamemo._MEMO.clear()
        metamemo._MEMO.update(saved)


def test_cap_eviction_thread_safe(tmp_path):
    """Review r10: planning parses headers concurrently, so the
    evict-one-at-cap path must survive a thread hammer (the unlocked
    draft could double-pop or die with 'dict changed size')."""
    from concurrent.futures import ThreadPoolExecutor

    p = str(tmp_path / "c.bin")
    with open(p, "wb") as f:
        f.write(b"x")
    saved = dict(metamemo._MEMO)
    try:
        metamemo._MEMO.clear()
        # prefill to one below cap so every insert races the evictor
        for i in range(metamemo._MAX_ENTRIES - 1):
            metamemo.memoized_parse(f"pre{i}", p, lambda _: i)

        def worker(base):
            for j in range(200):
                metamemo.memoized_parse(f"w{base}_{j}", p, lambda _: j)

        with ThreadPoolExecutor(8) as ex:
            list(ex.map(worker, range(8)))
        assert len(metamemo._MEMO) <= metamemo._MAX_ENTRIES
    finally:
        metamemo._MEMO.clear()
        metamemo._MEMO.update(saved)


def test_sidecar_persists_slow_parses_across_processes(tmp_path):
    """A parse over the persist threshold survives a simulated driver
    restart (in-process memo cleared): the sidecar supplies the value
    without re-running the parser."""
    import time

    p = str(tmp_path / "slow.bin")
    with open(p, "wb") as f:
        f.write(b"payload" * 100)
    calls = []

    def parse(path):
        calls.append(path)
        time.sleep(0.005)  # over _PERSIST_MIN_S
        return {"cols": ["a", "b"], "n": 7}

    a = metamemo.memoized_parse("t_side_slow", p, parse)
    metamemo._MEMO.clear()  # "new driver process"
    b = metamemo.memoized_parse("t_side_slow", p, parse)
    assert b == a and len(calls) == 1


def test_sidecar_skips_cheap_parses(tmp_path):
    """Sub-threshold parses never pay the store path — a fresh
    process re-parses (cheaper than the sidecar dance)."""
    p = str(tmp_path / "fast.bin")
    with open(p, "wb") as f:
        f.write(b"x")
    calls = []

    def parse(path):
        calls.append(path)
        return 42

    metamemo.memoized_parse("t_side_fast", p, parse)
    metamemo._MEMO.clear()
    metamemo.memoized_parse("t_side_fast", p, parse)
    assert len(calls) == 2


def test_sidecar_invalidates_on_rewrite(tmp_path):
    import time

    p = str(tmp_path / "rw.bin")
    with open(p, "wb") as f:
        f.write(b"version-one")
    calls = []

    def parse(path):
        calls.append(path)
        time.sleep(0.005)
        with open(path, "rb") as fh:
            return fh.read()

    a = metamemo.memoized_parse("t_side_rw", p, parse)
    assert a == b"version-one"
    tmp = p + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"version-TWO")
    os.replace(tmp, p)
    metamemo._MEMO.clear()
    b2 = metamemo.memoized_parse("t_side_rw", p, parse)
    assert b2 == b"version-TWO" and len(calls) == 2


def test_sidecar_tolerates_corruption(tmp_path):
    """A truncated/garbage sidecar silently falls back to parsing."""
    import time

    p = str(tmp_path / "c.bin")
    with open(p, "wb") as f:
        f.write(b"data")
    calls = []

    def parse(path):
        calls.append(path)
        time.sleep(0.005)
        return "ok"

    metamemo.memoized_parse("t_side_corrupt", p, parse)
    from polars_readstat_spark.sources.fs import fs_stat

    size, mtime = fs_stat(p)
    side = metamemo._sidecar_file(
        "t_side_corrupt", os.path.abspath(p), mtime, size
    )
    assert side and os.path.exists(side)
    with open(side, "wb") as f:
        f.write(b"\x80garbage-not-pickle")
    metamemo._MEMO.clear()
    assert metamemo.memoized_parse("t_side_corrupt", p, parse) == "ok"
    assert len(calls) == 2


def test_sidecar_invalidates_on_helper_module_change(tmp_path, monkeypatch):
    """The sidecar code stamp covers the whole sources/ package, not
    just the parse function's own module — a helper-only change
    (strdecode, shared page/meta utils) must drop existing sidecars
    (ADVICE r11). Simulated by forcing a different package stamp."""
    import time

    p = str(tmp_path / "helper.bin")
    with open(p, "wb") as f:
        f.write(b"payload" * 50)
    calls = []

    def parse(path):
        calls.append(path)
        time.sleep(0.005)
        return {"n": 1}

    metamemo.memoized_parse("t_side_helper", p, parse)
    assert len(calls) == 1
    metamemo._MEMO.clear()
    # same parse module, "changed" helper elsewhere in sources/
    monkeypatch.setattr(metamemo, "_PKG_STAMP", "deadbeefdeadbeef")
    metamemo.memoized_parse("t_side_helper", p, parse)
    assert len(calls) == 2  # sidecar refused, re-parsed
    metamemo._MEMO.clear()
    metamemo.memoized_parse("t_side_helper", p, parse)
    assert len(calls) == 2  # new-stamp sidecar now serves
