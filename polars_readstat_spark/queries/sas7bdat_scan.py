"""SAS7BDAT scans under the driver's independent DuckDB oracle.

sas7bdat is the reference's flagship format
(/root/reference/crates/polars_readstat_rs/src/sas/, ~7.9 kLoC) and the
only one without a writer anywhere, so it cannot join the write→scan
roundtrips in scanio.py. These queries instead scan five committed
public-corpus fixtures (tests/fixtures/sas7bdat/, provenance and
generation in tools/make_sas7bdat_twins.py) and compare against parquet
twins produced once by pandas.read_sas — an independent decoder. The
oracle SQL reads the twin via read_parquet(), which DuckDB allows
alongside the driver's pre-registered views.

Axis coverage:
- types              32-bit, LE, uncompressed, cp1252, mixed col types
- rle_omov           64-bit, LE, RLE (SASYZCRL), latin1, 2351 rows
                     (multi-page decompress)
- rdc_wide           32-bit, LE, RDC (SASYZCR2), cp1252, 100 columns,
                     date formats
- bigendian_datetime 64-bit, BE, date+datetime+time formats
- mixpage_latin      64-bit, LE, mix-page, latin1 non-ASCII text,
                     10k rows

Canonical projection (must mirror make_sas7bdat_twins.py exactly):
numerics double, strings ''→null, dates DATE, datetimes formatted
'yyyy-MM-dd HH:mm:ss' strings (tz-free both sides; fixture values are
whole seconds, asserted at twin generation), times float seconds.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    StringType,
    TimestampNTZType,
)

from polars_readstat_spark.queries.registry import query

_FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "sas7bdat",
)


def _twin_oracle(name: str) -> str:
    return (
        "SELECT * FROM read_parquet("
        f"'{os.path.join(_FIXDIR, name)}.twin.parquet')"
    )


def _canon_scan(spark, name: str):
    """Scan the fixture and project to the twin's canonical shape.

    Driven by the scan's own schema: SAS numerics only ever surface as
    double (values), date (date formats), timestamp_ntz (DATETIME) or
    long (TIME, ns since midnight) — so the dtype identifies the
    canonical transform, and a classification drift between our format
    parsing and the twin's (pandas') shows up as a driver schema/hash
    mismatch, which is the point.
    """
    import polars_readstat_spark as prs

    prs.register(spark)
    df = spark.read.format("readstat").load(
        os.path.join(_FIXDIR, f"{name}.sas7bdat")
    )
    proj = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, StringType):
            proj.append(F.nullif(F.rtrim(c), F.lit("")).alias(f.name))
        elif isinstance(f.dataType, TimestampNTZType):
            proj.append(
                F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(f.name)
            )
        elif isinstance(f.dataType, LongType):
            # TIME columns decode as int64 ns since midnight
            proj.append((c / F.lit(1_000_000_000)).cast("double").alias(f.name))
        elif isinstance(f.dataType, (DateType, DoubleType)):
            proj.append(c.alias(f.name))
        else:  # pragma: no cover — no other dtype leaves the sas reader
            proj.append(c.cast("double").alias(f.name))
    return df.select(*proj)


@query("scan_sas7bdat_types", oracle=_twin_oracle("types"))
def scan_sas7bdat_types(spark, sf_dir):
    """S4 under the oracle: 32-bit little-endian uncompressed file with
    float/int-stored-as-double/string columns, incl. subnormal-range
    doubles and an all-empty string column."""
    return _canon_scan(spark, "types")


@query("scan_sas7bdat_rle", oracle=_twin_oracle("rle_omov"))
def scan_sas7bdat_rle(spark, sf_dir):
    """S5 under the oracle: RLE (SASYZCRL) decompression across many
    pages of a real survey extract (2,351 rows × 8 cols, u64 layout)."""
    return _canon_scan(spark, "rle_omov")


@query("scan_sas7bdat_rdc", oracle=_twin_oracle("rdc_wide"))
def scan_sas7bdat_rdc(spark, sf_dir):
    """S6 under the oracle: RDC (SASYZCR2) decompression on a 100-column
    row layout with date-formatted and string columns."""
    return _canon_scan(spark, "rdc_wide")


@query("scan_sas7bdat_bigendian", oracle=_twin_oracle("bigendian_datetime"))
def scan_sas7bdat_bigendian(spark, sf_dir):
    """S4 byte-order axis: big-endian u64 file whose columns exercise
    all three SAS temporal mappings (date, DATETIME, TIME)."""
    return _canon_scan(spark, "bigendian_datetime")


@query("scan_sas7bdat_mixpage", oracle=_twin_oracle("mixpage_latin"))
def scan_sas7bdat_mixpage(spark, sf_dir):
    """S4 page-layout + encoding axes: mix-type pages (meta + data on
    one page) and latin1 text where every row is non-ASCII — the
    single-byte-encoding path the vectorized UTF-8 fast path must
    fall back from."""
    return _canon_scan(spark, "mixpage_latin")
