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
