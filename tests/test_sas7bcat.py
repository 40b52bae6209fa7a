"""SAS format catalog (.sas7bcat) tests — S8 reader + T3 apply.

Oracle: known-value checks against the data_gov/formats.sas7bcat
fixture (a real NCES private-school-survey catalog whose formats are
publicly documented), plus a synthetic apply test that exercises the
`F.when`-free map-literal decode plan.
"""

from __future__ import annotations

import os

import pytest

CAT = (
    "/root/reference/crates/polars_readstat_rs/tests/sas/data/"
    "data_gov/formats.sas7bcat"
)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(CAT), reason="catalog fixture not present"
)


@pytest.fixture(scope="module")
def catalog():
    import polars_readstat_spark as prs

    return prs.read_sas7bcat(CAT)


def test_catalog_known_numeric_format(catalog):
    assert catalog["REGIONF"] == {
        1.0: "Northeast", 2.0: "Midwest", 3.0: "South", 4.0: "West",
    }
    assert catalog["LEVELF"][1.0] == "Elementary"


def test_catalog_character_format(catalog):
    assert catalog["$FRAMEF"] == {
        "AREA": "School is part of area frame",
        "LIST": "School is part of list frame",
    }


def test_catalog_large_format_complete(catalog):
    # PSTANSIF maps ANSI state codes; spot-check coverage + values
    assert catalog["PSTANSIF"][1.0] == "Alabama"
    assert catalog["PSTANSIF"][4.0] == "Arizona"
    assert len(catalog["PSTANSIF"]) > 45


def test_apply_catalog_labels_plan(spark, catalog):
    """T3 decode: map-literal lookup with cast-to-string default —
    no UDF, no shuffle (a projection over the scan)."""
    from polars_readstat_spark.sources.sas7bcat import apply_catalog_labels

    df = spark.createDataFrame(
        [(1.0, "LIST"), (4.0, "AREA"), (9.0, "OTHER"), (None, None)],
        "region double, frame string",
    )
    out = apply_catalog_labels(
        df, catalog, columns={"region": "REGIONF", "frame": "$FRAMEF"}
    )
    rows = out.collect()
    assert [r.region for r in rows] == ["Northeast", "West", "9.0", None]
    assert rows[0].frame == "School is part of list frame"
    assert rows[2].frame == "OTHER"  # default: value as string
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # pure Catalyst, no Python UDF


def test_scan_readstat_catalog_option(spark, tmp_path, catalog):
    """catalog= accepts a path and applies formats by column format
    metadata; round-trip a dta tagged with a catalog format name."""
    import polars_readstat_spark as prs

    src = spark.createDataFrame([(1.0,), (3.0,)], "region double")
    p = str(tmp_path / "cat.xpt")
    prs.write_readstat(src, p)
    # xpt carries no format names here, so pass explicit mapping via
    # the operator; the scan-level option path is exercised with the
    # catalog file string
    df = prs.scan_readstat(spark, p, catalog=CAT)
    assert df.count() == 2  # no matching formats → passthrough
    from polars_readstat_spark.sources.sas7bcat import apply_catalog_labels

    out = apply_catalog_labels(df, catalog, columns={"REGION": "REGIONF"})
    assert [r.REGION for r in out.collect()] == ["Northeast", "South"]
