"""Generate parquet twins for the committed sas7bdat oracle fixtures.

sas7bdat is the one format with no writer anywhere (reference position
too, FIXTURES.md "File-format variants"), so its scan path cannot be
verified by a write→scan roundtrip like dta/sav/xpt/por. Instead the
repo commits five small public-corpus files spanning the hard axes
(32/64-bit, big-endian, RLE, RDC, mix-page, cp1252/latin1 encodings)
plus parquet "twins" produced by THIS script from pandas.read_sas — an
independent public decoder that never touches our code. The
scan_sas7bdat_* queries (queries/sas7bdat_scan.py) read the .sas7bdat
through Spark and their DuckDB oracle reads the twin, so a value-hash
match proves our decoder against pandas under the driver's gate. This
mirrors the reference's own differential spine
(crates/polars_readstat_rs/tests/sas/compare_to_python.py:1-60).

Canonical twin shape (the queries project the Spark scan identically):
- SAS numerics       -> float64, NaN -> null
- strings            -> decoded with the file's encoding, trailing
                        NUL/space stripped, '' -> null
- date formats       -> DATE
- DATETIME formats   -> 'YYYY-MM-DD HH:MM:SS' strings (tz-free on both
                        engines; every fixture's values are whole
                        seconds — the script asserts it)
- TIME formats       -> float64 seconds since midnight (pandas native)

Run from the repo root to (re)generate; twins are committed so the
gate never depends on the reference checkout:

    python tools/make_sas7bdat_twins.py
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pandas.io.sas.sas7bdat import SAS7BDATReader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "sas7bdat")
CORPUS = "/root/reference/crates/polars_readstat_rs/tests/sas/data"

# name -> (corpus-relative source, encoding). The encoding is the one
# declared in each file's header (verified against pandas' inferred
# encoding at generation time).
FIXTURES = {
    "types": ("data_misc/types.sas7bdat", "cp1252"),
    "rle_omov": ("data_AHS2013/omov.sas7bdat", "latin-1"),
    "rdc_wide": ("data_pandas/test3.sas7bdat", "cp1252"),
    "bigendian_datetime": ("data_pandas/datetime.sas7bdat", "latin-1"),
    "mixpage_latin": ("test_latin.sas7bdat", "latin-1"),
}

_DATE_FORMATS = {
    "DATE", "YYMMDD", "MMDDYY", "DDMMYY", "JULIAN", "MONYY", "YYQ",
    "WEEKDATE", "DDMMYYP", "DDMMYYB", "DDMMYYC", "DDMMYYD", "DDMMYYN",
    "DDMMYYS", "MMDDYYP", "MMDDYYB", "MMDDYYC", "MMDDYYD", "MMDDYYN",
    "MMDDYYS", "YYMMDDP", "YYMMDDB", "YYMMDDC", "YYMMDDD", "YYMMDDN",
    "YYMMDDS", "DATE9",
}
_DATETIME_FORMATS = {"DATETIME", "DATETIME18", "DATETIME19", "DATETIME20"}


def _col_formats(path: str) -> dict[str, str]:
    rdr = SAS7BDATReader(path, convert_dates=False, convert_text=False)
    fmts = {}
    for col in rdr.columns:
        name = col.name
        if isinstance(name, bytes):
            name = name.decode("utf-8", errors="replace")
        fmt = col.format
        if isinstance(fmt, bytes):
            fmt = fmt.decode("utf-8", errors="replace")
        fmts[name] = (fmt or "").upper().rstrip("0123456789.")
    rdr.close()
    return fmts


def make_twin(src: str, enc: str, dst: str) -> None:
    df = pd.read_sas(src)  # bytes strings, datetimes converted
    fmts = _col_formats(src)
    arrays, fields = [], []
    for c in df.columns:
        s = df[c]
        base_fmt = fmts.get(str(c), "")
        if s.dtype.kind == "M":
            nulls = s.isna()
            if base_fmt in _DATE_FORMATS or (
                base_fmt not in _DATETIME_FORMATS
                and (s.dt.normalize() == s).fillna(True).all()
            ):
                vals = [None if n else v.date() for v, n in zip(s, nulls)]
                arrays.append(pa.array(vals, type=pa.date32()))
                fields.append(pa.field(str(c), pa.date32()))
            else:
                us = s.values.astype("datetime64[us]").astype("int64")
                assert (us[~nulls.values] % 1_000_000 == 0).all(), (
                    f"{src}:{c} has sub-second datetimes; twin format "
                    "must widen past whole seconds"
                )
                vals = [
                    None if n else v.strftime("%Y-%m-%d %H:%M:%S")
                    for v, n in zip(s, nulls)
                ]
                arrays.append(pa.array(vals, type=pa.string()))
                fields.append(pa.field(str(c), pa.string()))
        elif s.dtype == object:
            vals = []
            for v in s:
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    vals.append(None)
                    continue
                if isinstance(v, bytes):
                    v = v.decode(enc)
                v = v.rstrip("\x00 ")
                vals.append(v if v != "" else None)
            arrays.append(pa.array(vals, type=pa.string()))
            fields.append(pa.field(str(c), pa.string()))
        else:
            arrays.append(pa.array(s.astype("float64"), from_pandas=True))
            fields.append(pa.field(str(c), pa.float64()))
    table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    pq.write_table(table, dst)
    print(f"{dst}: {table.num_rows} rows x {table.num_columns} cols")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    import shutil

    for name, (rel, enc) in FIXTURES.items():
        src = os.path.join(CORPUS, rel)
        fixture = os.path.join(OUT, f"{name}.sas7bdat")
        if not os.path.exists(fixture):
            shutil.copyfile(src, fixture)
        make_twin(fixture, enc, os.path.join(OUT, f"{name}.twin.parquet"))


if __name__ == "__main__":
    main()
