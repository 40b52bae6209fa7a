"""Corrupt-input behavior: garbage and truncated files fail fast with
informative errors at metadata-parse time (driver-side), never with
silent wrong data or executor-side surprises."""

from __future__ import annotations

import os

import pytest

CORPUS = "/root/reference/crates/polars_readstat_rs/tests"


def test_garbage_magic_rejected(tmp_path):
    from polars_readstat_spark.sources.dta.meta import parse_dta_meta
    from polars_readstat_spark.sources.sas7bdat.meta import parse_sas_meta
    from polars_readstat_spark.sources.sav.meta import parse_sav_meta

    g = tmp_path / "g.bin"
    g.write_bytes(b"\x99" * 512)
    with pytest.raises(ValueError):
        parse_dta_meta(str(g))
    with pytest.raises(ValueError):
        parse_sav_meta(str(g))
    with pytest.raises(ValueError):
        parse_sas_meta(str(g))


@pytest.mark.skipif(
    not os.path.isfile(f"{CORPUS}/stata/data/sample.dta"),
    reason="corpus missing",
)
def test_truncated_header_fails_fast(tmp_path):
    from polars_readstat_spark.sources.dta.meta import parse_dta_meta

    src = open(f"{CORPUS}/stata/data/sample.dta", "rb").read()
    t = tmp_path / "t.dta"
    t.write_bytes(src[:200])
    with pytest.raises((ValueError, EOFError)):
        parse_dta_meta(str(t))


def test_unknown_extension_rejected(spark):
    import polars_readstat_spark as prs

    prs.register(spark)
    with pytest.raises(Exception) as ei:
        spark.read.format("readstat").load("/tmp/nope.xyz").collect()
    assert "xyz" in str(ei.value) or "extension" in str(ei.value).lower() or "No such file" in str(ei.value)


# ── corrupt compressed-row streams: the wavefront decompressors must
# degrade to zero-fill within the row's own span, never read bytes
# from neighboring subheaders (the scalar walks operate on a sliced
# row buffer and cannot) ─────────────────────────────────────────────


def test_rle_overlong_copy_does_not_read_neighbor_bytes():
    import numpy as np

    from polars_readstat_spark.sources.sas7bdat.pages import (
        rle_decompress,
        rle_decompress_rows,
    )

    # copy64 claiming 64+2 bytes with only 4 payload bytes in-span;
    # the page continues with a neighbor's 0xAB bytes
    span = bytes([0x00, 0x02]) + b"ABCD"
    page = span + b"\xab" * 80
    row_length = 80
    mat = rle_decompress_rows(page, [(0, len(span))], row_length)
    got = mat[0].tobytes()
    scalar = rle_decompress(span, row_length)
    want = scalar.ljust(row_length, b"\x00")[:row_length]
    assert got == want
    assert b"\xab" not in got


def test_rle_stream_ending_inside_header_zero_fills():
    from polars_readstat_spark.sources.sas7bdat.pages import (
        rle_decompress_rows,
    )

    # long-form ctrl byte with no count byte; neighbor bytes follow
    span = b"\x81XY" + bytes([0x40])  # literal 'XY', then bare ctrl
    page = span + b"\xcd" * 40
    mat = rle_decompress_rows(page, [(0, len(span))], 20)
    got = mat[0].tobytes()
    assert got == b"XY" + b"\x00" * 18


def test_rdc_stream_ending_after_control_word_zero_fills():
    from polars_readstat_spark.sources.sas7bdat.pages import (
        rdc_decompress,
        rdc_decompress_rows,
    )

    # nonzero control word announcing a command, then nothing — the
    # scalar loop exits at i == n with an empty output
    span = b"\x80\x00"
    page = span + b"\xee" * 64
    mat = rdc_decompress_rows(page, [(0, len(span))], 32)
    got = mat[0].tobytes()
    assert got == rdc_decompress(span, 32).ljust(32, b"\x00")
    assert b"\xee" not in got


# ── fuzz: the wavefront and scalar decompressors must be BYTE-EQUAL on
# arbitrary (including corrupt/truncated/overrun) streams — the scalars
# retire at end-of-input with zero-fill and treat before-row-start
# back-references as zero runs, exactly like the wavefront clamps ─────


def _rle_pair(span: bytes, row_length: int):
    from polars_readstat_spark.sources.sas7bdat.pages import (
        rle_decompress,
        rle_decompress_rows,
    )

    try:
        want = rle_decompress(span, row_length)
    except ValueError:
        want = ValueError
    try:
        got = rle_decompress_rows(
            bytes(span) + b"\xa5" * 64, [(0, len(span))], row_length
        )[0].tobytes()
    except ValueError:
        got = ValueError
    return want, got


def _rdc_pair(span: bytes, row_length: int):
    from polars_readstat_spark.sources.sas7bdat.pages import (
        rdc_decompress,
        rdc_decompress_rows,
    )

    want = rdc_decompress(span, row_length)
    got = rdc_decompress_rows(
        bytes(span) + b"\xa5" * 64, [(0, len(span))], row_length
    )[0].tobytes()
    return want, got


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.binary(min_size=0, max_size=48),
        st.integers(min_value=1, max_value=96),
    )
    def test_fuzz_rle_wavefront_equals_scalar(span, row_length):
        want, got = _rle_pair(span, row_length)
        assert want == got

    @settings(max_examples=300, deadline=None)
    @given(
        st.binary(min_size=0, max_size=48),
        st.integers(min_value=1, max_value=96),
    )
    def test_fuzz_rdc_wavefront_equals_scalar(span, row_length):
        want, got = _rdc_pair(span, row_length)
        assert want == got

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=24), min_size=1, max_size=6))
    def test_fuzz_rdc_multirow_isolation(spans):
        """Rows in one page never read each other's bytes, whatever
        garbage each span holds."""
        from polars_readstat_spark.sources.sas7bdat.pages import (
            rdc_decompress,
            rdc_decompress_rows,
        )

        page = bytearray()
        offs = []
        for s in spans:
            offs.append((len(page), len(s)))
            page += s + b"\xee\xee"  # junk between spans
        mat = rdc_decompress_rows(bytes(page), offs, 40)
        for i, s in enumerate(spans):
            assert mat[i].tobytes() == rdc_decompress(s, 40)

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_literal_stream_validation_rejects_mid_stream_deviation(spark, tmp_path):
    """The parallel literal SAV/ZSAV plan rests on the plan-time
    whole-stream validation: flip ONE command byte mid-stream (a bias
    code where an 8x253 block belonged) and validation must return
    False so the read stays on the serial plan — the parallel affine
    map would silently misalign everything after the flip."""
    import struct

    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.sav import decode as D
    from polars_readstat_spark.sources.sav.meta import parse_sav_meta
    from pyspark.sql import functions as F

    # small all-literal compression=1 file built from an uncompressed
    # sav + a literal-framing re-encode (same trick as the bias test,
    # but all-253 so validation passes on the pristine copy)
    df = spark.range(20_000).select(
        (F.col("id") * 0.5).alias("a"),  # halves: never biasable
        (F.col("id") % 7).cast("double").alias("b"),
    )
    src = str(tmp_path / "lit_src.sav")
    prs.write_readstat(df, src)
    meta = parse_sav_meta(src)
    raw = open(src, "rb").read()
    els = raw[meta.data_offset :]
    els = els[: (len(els) // 8) * 8]
    out = bytearray()
    for g0 in range(0, len(els), 64):
        grp = els[g0 : g0 + 64]
        k = len(grp) // 8
        out += bytes([253] * k + [0] * (8 - k)) + grp
    out += bytes([252] + [0] * 7)
    hdr = bytearray(raw[: meta.data_offset])
    hdr[72:76] = struct.pack("<i", 1)  # compression=1

    clean = str(tmp_path / "clean.sav")
    open(clean, "wb").write(bytes(hdr) + bytes(out))
    mc = parse_sav_meta(clean)
    assert D.validate_literal_stream(mc, mc.nobs) is True

    # flip one mid-stream command byte → validation must reject
    bad = bytearray(out)
    g = (len(bad) // 72) // 2 * 72
    assert bad[g] == 253
    bad[g] = 100
    corrupt = str(tmp_path / "corrupt.sav")
    open(corrupt, "wb").write(bytes(hdr) + bytes(bad))
    m2 = parse_sav_meta(corrupt)
    assert D.validate_literal_stream(m2, m2.nobs) is False


def test_truncated_sas_data_pages_yield_complete_pages(spark, tmp_path):
    """A sas7bdat cut mid-DATA-page reads every COMPLETE page's rows
    and stops — no crash, no partial-row garbage. Pins the ranged
    fetch's truncation semantics (split_pages drops a short tail page,
    matching the old per-page short-read break)."""
    from pyspark.sql import functions as F

    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.sas7bdat.meta import parse_sas_meta
    from polars_readstat_spark.writers.sas7bdat import write_sas7bdat

    prs.register(spark)
    full = str(tmp_path / "full.sas7bdat")
    write_sas7bdat(
        spark.range(50000).select(
            F.col("id").cast("double").alias("a"),
            (F.col("id") % 9).cast("double").alias("b"),
        ),
        full,
    )
    m = parse_sas_meta(full)
    assert m.page_count >= 3, "fixture too small to truncate mid-data"
    # keep the header + all but the last 1.5 pages
    keep = m.header_length + (m.page_count - 2) * m.page_length + m.page_length // 2
    cut = str(tmp_path / "cut.sas7bdat")
    with open(full, "rb") as f:
        blob = f.read(keep)
    with open(cut, "wb") as f:
        f.write(blob)
    got = (
        spark.read.format("readstat").load(cut)
        .agg(F.count("*").alias("n"), F.max("a").alias("mx"))
        .collect()[0]
    )
    want = (
        spark.read.format("readstat").load(full)
        .filter(F.col("a") < got.mx + 1)
        .count()
    )
    # complete pages only: fewer rows than the full file, contiguous
    # prefix (max id == rowcount - 1), and exactly the rows the full
    # file holds below that id
    assert 0 < got.n < 50000
    assert got.mx == got.n - 1
    assert want == got.n
