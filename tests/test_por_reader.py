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
