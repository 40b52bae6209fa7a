"""Property-based writer↔reader roundtrips (hypothesis).

The deterministic roundtrip matrix (test_writers_roundtrip.py) pins
known shapes; this suite throws generated data at the dta and sav
paths — adversarial strings (NULs, non-ASCII, width-boundary), full
numeric ranges with nulls, empty partitions — and asserts the read
side returns exactly what was written. One Spark roundtrip per
hypothesis example would take minutes, so examples are generated as
COLUMNS and the roundtrip runs once per settings profile.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st

# strings a stat-format writer must survive: empty, spaces, non-ASCII
# (UTF-8 multibyte), and strings at/over typical width boundaries.
_strings = st.one_of(
    st.just(""),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00", max_codepoint=0x2FFF
        ),
        max_size=12,
    ),
    st.just("x" * 64),
)
_doubles = st.one_of(
    st.none(),
    st.floats(
        allow_nan=False,
        allow_infinity=False,
        min_value=-1e12,
        max_value=1e12,
    ),
    st.just(0.0),
    st.just(-0.0),
)
_ints = st.one_of(
    st.none(), st.integers(min_value=-(2**31) + 1, max_value=2**31 - 2)
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


def _roundtrip(spark, tmp_path, ext, rows):
    import polars_readstat_spark as prs

    if ext == "por":
        # POR folds its documented semantics into `want`: strings are
        # sanitized to the portable charset (latin-1 'replace', then
        # out-of-charset bytes → '?'), and ~14% of full-precision
        # doubles read back within 1 ulp rather than bit-exact (the
        # shortest-token ladder's documented fallback) — compared
        # with rel=1e-12 below
        from polars_readstat_spark.writers.por import _POR_SAFE

        rows = [
            (
                s.encode("latin-1", "replace")
                .translate(_POR_SAFE)
                .decode("latin-1"),
                x,
                n,
            )
            for s, x, n in rows
        ]
    if ext == "xpt":
        # fold xpt's documented format semantics into `want`:
        # - IBM/370 hex floats flush magnitudes below the normalized
        #   minimum (2^-260 after hex normalization) to zero, and have
        #   no signed zero;
        # - cells are space-padded, so trailing spaces don't survive
        #   (rstrip both sides so the sort keys align)
        rows = [
            (
                s,
                0.0 if x is not None and abs(x) < 2.0**-260 else x,
                n,
            )
            for s, x, n in rows
        ]
    # Trailing-whitespace fold (r13, probed + pinned by the '\r ' /
    # 'a\t ' regression rows): what survives a roundtrip is
    # format-specific — the SPSS binary family's reader implements
    # pyreadstat's unicode-rstrip semantics (sources/sav/decode.py
    # slow path), so ALL trailing whitespace folds away; the
    # fixed-width SAS family (and POR after its charset fold) strips
    # only trailing SPACES; dta preserves strings byte-for-byte.
    if ext in ("sav", "sav_bc", "zsav"):
        rows = [(s.rstrip(), x, n) for s, x, n in rows]
    elif ext in ("xpt", "por", "sas7bdat", "sas7bdat_rle",
                 "sas7bdat_rdc"):
        rows = [(s.rstrip(" "), x, n) for s, x, n in rows]
    df = spark.createDataFrame(
        rows, "s string, x double, n int"
    ).repartition(3)
    kwargs = {}
    if ext == "sas7bdat_rle":
        ext, kwargs = "sas7bdat", {"compress": "rle"}
    elif ext == "sas7bdat_rdc":
        ext, kwargs = "sas7bdat", {"compress": "rdc"}
    elif ext == "sav_bc":
        # bytecode-compressed sav (bias/literal command stream — what
        # SPSS writes by default); reads restart at checkpoint indexes
        ext, kwargs = "sav", {"compress": True}
    p = str(tmp_path / f"prop_rt.{ext}")
    prs.write_readstat(df, p, **kwargs)
    back = spark.read.format("readstat").load(p)
    back = back.toDF(*[c.lower() for c in back.columns])  # xpt v5 uppercases
    def key(t):
        s, x, n = t
        # fixed-width stat formats strip trailing spaces, so strings
        # differing only in trailing spaces must sort identically on
        # both sides or the pairwise compare misaligns. The double
        # component is quantized to 12 significant digits (subnormals
        # to 0.0) for the same reason: POR's documented ≤1-ulp /
        # gradual-underflow drift would otherwise reorder rows between
        # `want` and `got`. Full precision stays as the LAST tiebreak,
        # where any residual drift only swaps rows the approx compare
        # accepts either way.
        if x is None:
            xq = xf = 0.0
        else:
            xf = x
            xq = 0.0 if abs(x) < 2.3e-308 else float(f"{x:.12e}")
        return (s, x is None, xq,
                n is None, n if n is not None else 0, xf)

    want = sorted(
        (((r.s or ""), r.x, r.n) for r in df.collect()), key=key
    )
    got = sorted(
        (
            (
                (r.s or ""),
                None
                if r.x is None
                or (isinstance(r.x, float) and math.isnan(r.x))
                else r.x,
                None if r.n is None else int(r.n),
            )
            for r in back.collect()
        ),
        key=key,
    )
    assert len(got) == len(want)
    for (gs, gx, gn), (ws, wx, wn) in zip(got, want):
        # want is pre-folded to the format's documented trim
        assert gs == ws
        if wx is None:
            assert gx is None
        elif ext == "por":
            # subnormal wants (|x| < smallest normal) may lose
            # precision or flush through the base-30 token chain —
            # the parser's 30**exp scale underflows first (verified:
            # 5e-324 reads back 0.0, 1e-310 within 5e-14 rel) — so
            # they get an absolute floor; normals stay at 1e-12 rel
            assert gx == pytest.approx(wx, rel=1e-12, abs=2.3e-308)
        else:
            assert gx == pytest.approx(wx, rel=0, abs=0)
        assert gn == (None if wn is None else int(wn))


def _generate_row_sets(n=12):
    """Draw n generated row-sets eagerly so Spark runs outside @given."""
    sets: list = []

    @settings(max_examples=n, deadline=None, database=None)
    @given(
        rows=st.lists(
            st.tuples(_strings, _doubles, _ints), min_size=1, max_size=25
        )
    )
    def draw(rows):
        sets.append(rows)

    draw()
    return sets


@pytest.mark.parametrize(
    "ext",
    [
        "dta", "sav", "sav_bc", "zsav", "xpt", "por",
        "sas7bdat", "sas7bdat_rle", "sas7bdat_rdc",
    ],
)
def test_property_roundtrip(spark, tmp_path, ext):
    row_sets = _generate_row_sets()
    # merge all drawn sets into one corpus: one Spark roundtrip per
    # format covers every generated example
    rows = [t for s in row_sets for t in s]
    # pinned regression (r13): strings ending in non-space whitespace
    # + spaces — the formats strip only the trailing SPACES on read
    # ('\r ' → '\r'), which a full str.rstrip() sort key conflated
    # with '' and misaligned the pairwise compare
    rows += [("\r", 1.0, 1), ("\r ", 2.0, 2), ("", 3.0, 3), ("a\t ", 4.0, 4)]
    _roundtrip(spark, tmp_path, ext, rows)


def test_property_partitioned_roundtrip_dta(spark, tmp_path):
    """Same generated corpus through the DISTRIBUTED export path
    (write_readstat_partitioned: executor-side pack, one file per
    partition, shared column plan) and back through the multi-file
    directory scan — partition boundaries must not change any value."""
    import math

    import polars_readstat_spark as prs

    rows = [t for s in _generate_row_sets() for t in s]
    df = spark.createDataFrame(rows, "s string, x double, n int").repartition(5)
    d = str(tmp_path / "prop_parts")
    prs.write_readstat_partitioned(df, d, ext="dta")
    back = spark.read.format("readstat").load(d)

    def key(t):
        s, x, n = t
        return (s.rstrip(" "), x is None, x if x is not None else 0.0,
                n is None, n if n is not None else 0)

    want = sorted((((r.s or ""), r.x, r.n) for r in df.collect()), key=key)
    got = sorted(
        (
            (
                (r.s or ""),
                None
                if r.x is None or (isinstance(r.x, float) and math.isnan(r.x))
                else r.x,
                None if r.n is None else int(r.n),
            )
            for r in back.collect()
        ),
        key=key,
    )
    assert got == want
