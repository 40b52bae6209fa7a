"""SPSS portable (.por) reader tests.

sample.por is a sibling export of sample.sav/sample.zsav (pyreadstat
fixture family) — the base-30 ASCII decode path must agree with the
two binary paths (three independent decoders, one truth).
"""

from __future__ import annotations

import datetime
import os

import pytest

CORPUS = "/root/reference/crates/polars_readstat_rs/tests/spss/data"
POR = f"{CORPUS}/sample.por"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(POR), reason="reference sample.por not present"
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    import polars_readstat_spark as prs

    prs.register(spark)


def _load(spark, path, **opts):
    r = spark.read.format("readstat")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


def test_por_matches_sav(spark):
    """Cross-format differential: POR ≡ SAV data (names are upper-case
    in the portable file; values and types must agree)."""
    por = _load(spark, POR)
    sav = _load(spark, f"{CORPUS}/sample.sav")
    assert [c.lower() for c in por.columns] == [c.lower() for c in sav.columns]
    assert [f.dataType for f in por.schema.fields] == [
        f.dataType for f in sav.schema.fields
    ]
    p = [tuple(r) for r in por.collect()]
    s = [tuple(r) for r in sav.collect()]
    assert p == s


def test_por_known_values(spark):
    rows = _load(spark, POR).collect()
    assert [r.MYCHAR for r in rows] == ["a", "b", "c", "d", "e"]
    assert [r.MYNUM for r in rows] == [1.1, 1.2, -1000.3, -1.4, 1000.3]
    assert rows[0].MYDATE == datetime.date(2018, 5, 6)
    assert rows[0].DTIME == datetime.datetime(2018, 5, 6, 10, 10, 10)
    assert rows[4].MYTIME is None


def test_por_options(spark):
    df = _load(spark, POR, columns="MYNUM,MYCHAR", n_rows="2", offset="1")
    rows = df.collect()
    assert df.columns == ["MYNUM", "MYCHAR"]
    assert [r.MYNUM for r in rows] == [1.2, -1000.3]


def test_fast_b30_bit_identical_to_reference_parser():
    """The bulk tokenizer's fast base-30 parse must be bit-identical
    to the accumulator parser for every token shape (int, fraction,
    exponent, signs) — randomized differential check."""
    import random
    import struct

    from polars_readstat_spark.sources.por.reader import (
        _fast_b30,
        _parse_base30,
    )

    random.seed(42)
    digits = "0123456789ABCDEFGHIJKLMNOPQRST"
    checked = 0
    for _ in range(20000):
        tok = ""
        if random.random() < 0.3:
            tok += random.choice("+-")
        tok += "".join(random.choice(digits) for _ in range(random.randint(1, 12)))
        if random.random() < 0.5:
            tok += "." + "".join(
                random.choice(digits) for _ in range(random.randint(1, 6))
            )
        if random.random() < 0.3:
            tok += random.choice("+-") + "".join(
                random.choice(digits) for _ in range(random.randint(1, 2))
            )
        try:
            ref = _parse_base30(tok)
        except Exception:
            continue  # overflow tokens raise in both parsers
        checked += 1
        assert struct.pack("<d", _fast_b30(tok)) == struct.pack("<d", ref), tok
    assert checked > 10000


# ── vectorized case-data parser (round 4) ──────────────────────────


def _roundtrip_cols(spark, tmp_path, df, name):
    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.por import reader as R

    p = str(tmp_path / name)
    prs.write_readstat(df, p)
    meta, st = R.parse_por(p)
    s = R._bulk_chars(st)
    return meta, s


def _assert_vec_equals_scalar(meta, s, expect_vec=True):
    import numpy as np

    from polars_readstat_spark.sources.por import reader as R

    vec = R._read_cases_vectorized(meta, s)
    if expect_vec:
        assert vec is not None, "vectorized path unexpectedly declined"
    sc = R._read_cases_scalar(meta, s)
    if vec is None:
        return
    assert len(vec) == len(sc)
    for j, (a, b) in enumerate(zip(vec, sc)):
        if isinstance(a, np.ndarray):
            bb = np.asarray(b, dtype=np.float64)
            assert a.shape == bb.shape, (j, a.shape, bb.shape)
            assert (a.view(np.uint64) == bb.view(np.uint64)).all(), j
        else:
            import pyarrow as pa

            # string columns come back as arrow arrays from the
            # vectorized gather (lists from the scalar walk)
            al = a.to_pylist() if isinstance(a, pa.Array) else a
            assert al == b, j


def test_vectorized_matches_scalar_mixed(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        F.col("id").cast("double").alias("a"),
        (F.rand(11) * 1e6).alias("b"),
        F.rand(13).alias("c"),
        F.concat(F.lit("s"), (F.col("id") % 37).cast("string")).alias("s1"),
        (F.col("id") % 97 / 10.0).alias("d"),
    )
    meta, s = _roundtrip_cols(spark, tmp_path, df, "mixed.por")
    _assert_vec_equals_scalar(meta, s)


def test_vectorized_matches_scalar_numeric_sysmis(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        F.when(F.col("id") % 3 != 0, F.col("id").cast("double")).alias("a"),
        F.when(F.col("id") % 5 != 0, F.rand(17)).alias("b"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(-F.col("id").cast("double") / 7)
        .alias("c"),
    )
    meta, s = _roundtrip_cols(spark, tmp_path, df, "sysmis.por")
    _assert_vec_equals_scalar(meta, s)


def test_vectorized_strings_with_sysmis(spark, tmp_path):
    """Strings + sysmis — vectorized since round 6 via the cumulative
    value-index mapping (was the one always-scalar shape); must take
    the fast path, match the scalar walk, and stay correct end-to-end
    through the reader."""
    from pyspark.sql import functions as F

    import polars_readstat_spark as prs
    from polars_readstat_spark.sources.por import reader as R

    df = spark.range(500).select(
        F.when(F.col("id") % 3 != 0, F.col("id").cast("double")).alias("a"),
        F.concat(F.lit("x"), (F.col("id") % 5).cast("string")).alias("s"),
    )
    p = str(tmp_path / "strsys.por")
    prs.write_readstat(df, p)
    meta, st = R.parse_por(p)
    s = R._bulk_chars(st)
    _assert_vec_equals_scalar(meta, s)
    back = prs.read_readstat(spark, p)
    assert len(back) == 500
    assert back["A"].isna().sum() == len([i for i in range(500) if i % 3 == 0])


def test_b30_batch_bit_identity_random_tokens():
    import random

    import numpy as np

    from polars_readstat_spark.sources.por import reader as R

    rng = random.Random(1234)
    digits = "0123456789ABCDEFGHIJKLMNOPQRST"
    toks = []
    for _ in range(5000):
        ip = "".join(rng.choice(digits) for _ in range(rng.randint(0, 13)))
        fr = "".join(rng.choice(digits) for _ in range(rng.randint(0, 20)))
        t = ip if rng.random() < 0.5 else ip + "." + fr
        if rng.random() < 0.4:
            e = rng.randint(1, 120)
            es = ""
            while e:
                es = digits[e % 30] + es
                e //= 30
            t += rng.choice("+-") + es
        if rng.random() < 0.3:
            t = rng.choice("+-") + t
        toks.append(t)
    blob = "".join(tok + "/" for tok in toks)
    u = np.frombuffer(blob.encode("latin-1"), np.uint8)
    ends = np.flatnonzero(u == ord("/"))
    starts = np.empty(ends.size, np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals, ok = R._b30_batch(u, starts, ends)
    R._scalar_patch(blob, vals, starts, ends, ok)
    ref = np.array([R._parse_base30(t) for t in toks])
    same = vals.view(np.uint64) == ref.view(np.uint64)
    same |= np.isnan(vals) & np.isnan(ref)
    assert same.all()


def test_shortest_b30_never_worse_than_full_expansion():
    import random

    from polars_readstat_spark.sources.por.reader import _parse_base30
    from polars_readstat_spark.writers.por import (
        PRECISION,
        _render_b30,
        _shortest_b30,
    )

    rng = random.Random(99)
    cases = [0.0, 1.0, 0.5, 0.57, 1 / 3, 1e-300, 1e300, 5e-324, 2.0**53 + 1]
    for _ in range(2000):
        cases.append(rng.random())
        cases.append(rng.random() * rng.choice([1e-9, 1e-3, 1e3, 1e12]))
    for a in cases:
        tok = _shortest_b30(a)
        got = _parse_base30(tok)
        full = _parse_base30(_render_b30(a, PRECISION, False))
        assert abs(got - a) <= abs(full - a), (a, tok)

def test_integer_fast_path_boundary_pins():
    """The 11-digit integer fast path is exact by proof, not luck:
    30^11 ≈ 1.77e16 > 2^53, but digits 1-10 accumulate exactly
    (< 30^10 < 2^53) and the 11th step's num*30 is an even integer
    < 2^54 (exactly representable), so the final +d is one correctly
    rounded operation on the exact N — same single rounding as
    float(int(tok, 30)). Pins the (2^53, 30^11) range so a future
    numpy/rounding change can't silently diverge; 12-digit tokens
    must route to the scalar accumulator in both parsers."""
    import struct

    import numpy as np

    from polars_readstat_spark.sources.por import reader as R
    from polars_readstat_spark.writers.por import _B30_POW11, _num_token

    assert _B30_POW11 == 30.0 ** 11
    assert 30 ** 10 < 2 ** 53 < 30 ** 11 < 2 ** 54

    def b30(n):
        digits = "0123456789ABCDEFGHIJKLMNOPQRST"
        s = ""
        while n:
            s = digits[n % 30] + s
            n //= 30
        return s or "0"

    def batch_one(tok):
        u = np.frombuffer((tok + "/").encode("latin-1"), np.uint8)
        starts = np.array([0], np.int64)
        ends = np.array([len(tok)], np.int64)
        return R._b30_batch(u, starts, ends)

    # 11-digit boundary band: scalar fast == accumulator == batch ==
    # correctly rounded float(N); sweep odd/even N around 2^53 where
    # the final rounding actually engages
    pins = [
        30 ** 10,              # smallest 11-digit value
        2 ** 53 - 1,
        2 ** 53,
        2 ** 53 + 1,           # first non-representable odd integer
        2 ** 53 + 2,
        2 ** 53 + 3,
        30 ** 11 - 1,          # largest 11-digit value
        30 ** 11 - 29,
    ] + [2 ** 53 + k for k in range(4, 64)]
    for n in pins:
        tok = b30(n)
        assert len(tok) == 11
        want = struct.pack("<d", float(n))  # correctly rounded N
        assert struct.pack("<d", R._fast_b30(tok)) == want, tok
        assert struct.pack("<d", R._parse_base30(tok)) == want, tok
        vals, ok = batch_one(tok)
        assert ok[0], tok
        assert struct.pack("<d", float(vals[0])) == want, tok

    # 12-digit tokens: outside the proof → both fast paths decline
    for n in (30 ** 11, 30 ** 12 - 1, 2 ** 57 + 11):
        tok = b30(n)
        assert len(tok) == 12
        _vals, ok = batch_one(tok)
        assert not ok[0]  # caller patches via the scalar accumulator
        assert struct.pack("<d", R._fast_b30(tok)) == struct.pack(
            "<d", R._parse_base30(tok)
        )

    # writer boundary: integer-valued doubles below 30^11 take the
    # positional fast path and roundtrip bit-exactly; at/above 30^11
    # the ladder takes over and must also roundtrip
    for v in (
        float(30 ** 10),
        float(2 ** 53),
        9.1e15,
        1.7e16,
        float(30 ** 11 - 16),  # representable, near the top
        float(30 ** 11),       # first ladder value
        1.8e16,
    ):
        assert float(v).is_integer()
        tok = _num_token(v).rstrip("/")
        back = R._parse_base30(tok)
        assert struct.pack("<d", back) == struct.pack("<d", v), (v, tok)


def test_vectorized_sysmis_with_strings(spark, tmp_path):
    """The survey shape — '*.' sysmis interleaved with string payloads
    — previously always fell to the scalar walk; the cumulative
    value-index mapping now vectorizes it. Each sub-shape must take
    the vectorized path AND match the scalar walk bit-for-bit."""
    from pyspark.sql import functions as F

    frames = {
        "nulls_mid": spark.range(2500).select(
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.col("id").cast("double"))
            .alias("a"),
            F.concat(F.lit("s"), (F.col("id") % 37).cast("string")).alias("s1"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") * 0.25)
            .alias("b"),
        ),
        # two sysmis in ONE segment (both numerics null on even rows)
        "double_sysmis": spark.range(1200).select(
            F.when(F.col("id") % 2 == 0, None)
            .otherwise(F.col("id").cast("double"))
            .alias("a"),
            F.when(F.col("id") % 2 == 0, None).otherwise(F.lit(1.5)).alias("b"),
            F.concat(F.lit("x"), (F.col("id") % 11).cast("string")).alias("s1"),
            F.when(F.col("id") % 5 == 0, None).otherwise(F.lit(2.5)).alias("c"),
        ),
        # string column FIRST: payload-prefix chain wraps across rows
        "string_first": spark.range(900).select(
            F.concat(F.lit("w"), (F.col("id") % 13).cast("string")).alias("s1"),
            F.when(F.col("id") % 4 == 0, None)
            .otherwise(F.col("id").cast("double"))
            .alias("a"),
        ),
    }
    for name, df in frames.items():
        meta, s = _roundtrip_cols(spark, tmp_path, df, f"stars_{name}.por")
        _assert_vec_equals_scalar(meta, s)


def test_sysmis_strings_adversarial_declines(spark, tmp_path):
    """Payloads containing '/' desynchronize the slash-segment index
    and payloads containing '*' inflate the speculative star counts —
    both must decline to the scalar walk (never misparse), and the
    scalar result must round-trip the values."""
    from pyspark.sql import functions as F

    df = spark.range(800).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("a"),
        F.concat(F.lit("a*b/c"), (F.col("id") % 7).cast("string")).alias("s1"),
    )
    meta, s = _roundtrip_cols(spark, tmp_path, df, "stars_adv.por")
    from polars_readstat_spark.sources.por import reader as R

    assert R._read_cases_vectorized(meta, s) is None
    cols = R._read_cases_scalar(meta, s)
    assert cols[1][:3] == ["a*b/c0", "a*b/c1", "a*b/c2"]


def test_sysmis_strings_randomized_differential():
    """Randomized streams over the stars+strings grammar: random null
    patterns, payload contents (incl. digits/dots that could confuse
    token parsing), and column layouts. The vectorized parse must
    either decline or agree with the scalar walk exactly — 200 random
    frames."""
    import random
    from types import SimpleNamespace

    import numpy as np
    import pyarrow as pa

    from polars_readstat_spark.sources.por import reader as R
    from polars_readstat_spark.writers.por import _num_token

    rng = random.Random(777)
    for trial in range(200):
        n_vars = rng.randint(2, 5)
        is_str = [rng.random() < 0.4 for _ in range(n_vars)]
        if all(is_str):
            is_str[rng.randrange(n_vars)] = False
        n_rows = rng.randint(1, 40)
        cols = [[] for _ in range(n_vars)]
        parts = []
        for _r in range(n_rows):
            for c in range(n_vars):
                if is_str[c]:
                    k = rng.randint(0, 6)
                    payload = "".join(
                        rng.choice("abXY019T.-+ ") for _ in range(k)
                    )
                    parts.append(_num_token(float(len(payload))) + payload)
                    cols[c].append(payload.rstrip())
                elif rng.random() < 0.3:
                    parts.append("*.")
                    cols[c].append(float("nan"))
                else:
                    v = round(rng.uniform(-1e4, 1e4), rng.randint(0, 3))
                    parts.append(_num_token(v))
                    cols[c].append(v)
        s = "".join(parts) + "Z" * 20
        meta = SimpleNamespace(
            variables=[
                SimpleNamespace(is_str=b, name=f"v{i}")
                for i, b in enumerate(is_str)
            ]
        )
        vec = R._read_cases_vectorized(meta, s)
        sc = R._read_cases_scalar(meta, s)
        for j in range(n_vars):
            assert len(sc[j]) == n_rows, (trial, j)
            if is_str[j]:
                assert sc[j] == cols[j], (trial, j)
            if vec is None:
                continue
            a, b = vec[j], sc[j]
            if is_str[j]:
                al = a.to_pylist() if isinstance(a, pa.Array) else list(a)
                assert al == b, (trial, j)
            else:
                aa = np.asarray(a)
                bb = np.asarray(b, dtype=np.float64)
                same = (aa.view(np.uint64) == bb.view(np.uint64)) | (
                    np.isnan(aa) & np.isnan(bb)
                )
                assert same.all(), (trial, j)


def test_gather_strings_rstrips_ascii_control_whitespace():
    """Payloads ending in FS/GS/RS/US (0x1C-0x1F) must decode
    identically on the vectorized gather and the scalar
    str.rstrip() walk — Python's str.rstrip() strips these ASCII
    control bytes, so _WS must include them."""
    import numpy as np
    import pyarrow as pa

    from polars_readstat_spark.sources.por import reader as R

    payloads = [
        "abc\x1c",
        "abc\x1d\x1d",
        "abc\x1e \t",
        "abc\x1f",
        "\x1c\x1d\x1e\x1f",
        "keep\x1cinner\x1d",
        "plain",
        "trail \x0b\x0c",
    ]
    s = "".join(payloads)
    u = np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
    ends = np.cumsum([len(p) for p in payloads]).astype(np.int64)
    starts = np.concatenate([[0], ends[:-1]]).astype(np.int64)
    ln = ends - starts
    arr = R._gather_strings(s, u, starts, ends, ln)
    got = arr.to_pylist() if isinstance(arr, pa.Array) else list(arr)
    want = [p.rstrip() for p in payloads]
    assert got == want
