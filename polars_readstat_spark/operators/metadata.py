"""Metadata surface (SURVEY.md §1.4) — all five formats.

Three shapes, mirroring the reference:
1. ``metadata_dict(path)`` — JSON-able dict with file info + per-
   variable entries (reference readstat_metadata_json, src/lib.rs:486-502)
2. ``metadata_df(spark, path)`` — the canonical 12-column per-variable
   DataFrame, identical schema for every format
   (reference src/metadata_df.rs:3-8, :184-197)
3. StructField.metadata on the scan schema (label / format /
   value_label), attached by the data source itself.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

METADATA_DF_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("value_label_codes", T.ArrayType(T.StringType())),
        T.StructField("value_label_labels", T.ArrayType(T.StringType())),
        T.StructField("format", T.StringType()),
        T.StructField("format_type", T.StringType()),
        T.StructField("format_width", T.IntegerType()),
        T.StructField("format_decimals", T.IntegerType()),
        T.StructField("measure", T.StringType()),
        T.StructField("display_width", T.IntegerType()),
        T.StructField("alignment", T.StringType()),
        T.StructField("string_width_bytes", T.IntegerType()),
    ]
)

_MEASURE = {1: "nominal", 2: "ordinal", 3: "scale"}
_ALIGN = {0: "left", 1: "right", 2: "center"}


def _parse_fmt(fmt: str) -> tuple[str, int | None, int | None]:
    """Split a Stata display format %[-]w.df into (type, width, dec)."""
    if not fmt.startswith("%"):
        return (fmt, None, None)
    body = fmt[1:].lstrip("-")
    num = ""
    i = 0
    while i < len(body) and body[i].isdigit():
        num += body[i]
        i += 1
    rest = body[i:]
    width = int(num) if num else None
    dec = None
    if rest.startswith("."):
        j = 1
        d = ""
        while j < len(rest) and rest[j].isdigit():
            d += rest[j]
            j += 1
        dec = int(d) if d else None
        rest = rest[j:]
    return (rest or body, width, dec)


def _rows_dta(meta):
    for v in meta.variables:
        labels = meta.value_labels.get(v.lblname, {}) if v.lblname else {}
        ftype, fwidth, fdec = _parse_fmt(v.fmt) if v.fmt else (None, None, None)
        yield (
            v.name, v.varlabel or None,
            [str(k) for k in labels] or None,
            [labels[k] for k in labels] or None,
            v.fmt or None, ftype, fwidth, fdec,
            None, None, None,
            v.width if v.kind == "str" else None,
        )


def _rows_sav(meta):
    from polars_readstat_spark.sources.sav.meta import FMT_NAMES

    for v in meta.variables:
        labels = v.value_labels
        codes = [
            str(int(k)) if isinstance(k, float) and float(k).is_integer()
            else str(k)
            for k in labels
        ]
        yield (
            v.name, v.label or None,
            codes or None,
            [labels[k] for k in labels] or None,
            v.fmt or None,
            FMT_NAMES.get(v.fmt_type), v.fmt_width or None, v.fmt_dec or None,
            _MEASURE.get(v.measure), v.display_width or None,
            _ALIGN.get(v.alignment),
            v.string_len if v.is_str else None,
        )


def _rows_por(meta):
    from polars_readstat_spark.sources.sav.meta import FMT_NAMES

    for v in meta.variables:
        labels = v.value_labels
        ft = v.fmt_type - 82 if v.fmt_type > 82 else v.fmt_type
        codes = [
            str(int(k)) if isinstance(k, float) and float(k).is_integer()
            else str(k)
            for k in labels
        ]
        yield (
            v.name, v.label or None,
            codes or None,
            [labels[k] for k in labels] or None,
            (FMT_NAMES.get(ft, "") + str(v.fmt_width)) if FMT_NAMES.get(ft) else None,
            FMT_NAMES.get(ft), v.fmt_width or None, v.fmt_dec or None,
            None, None, None,
            v.width if v.is_str else None,
        )


def _rows_sas(meta):
    for c in meta.columns:
        ftype = c.fmt.rstrip("0123456789.") or None if c.fmt else None
        yield (
            c.name, c.label or None,
            None, None,
            c.fmt or None, ftype, None, None,
            None, None, None,
            c.width if c.ctype == "s" else None,
        )


def _rows_xpt(meta):
    for v in meta.variables:
        ftype = v.fmt.rstrip("0123456789.") or None if v.fmt else None
        yield (
            v.name, v.label or None,
            None, None,
            v.fmt or None, ftype, None, None,
            None, None, None,
            None if v.is_numeric else v.width,
        )


def _load(path: str):
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext == "dta":
        from polars_readstat_spark.sources.dta.meta import parse_dta_meta

        return ext, parse_dta_meta(path)
    if ext in ("sav", "zsav"):
        from polars_readstat_spark.sources.sav.meta import parse_sav_meta

        return "sav", parse_sav_meta(path)
    if ext == "por":
        from polars_readstat_spark.sources.por.reader import parse_por

        return ext, parse_por(path)[0]
    if ext == "sas7bdat":
        from polars_readstat_spark.sources.sas7bdat.meta import parse_sas_meta

        return ext, parse_sas_meta(path)
    if ext == "xpt":
        from polars_readstat_spark.sources.xpt.meta import parse_xpt_meta

        return ext, parse_xpt_meta(path)
    raise NotImplementedError(f"metadata: unsupported format for {path}")


_ROWS = {
    "dta": _rows_dta,
    "sav": _rows_sav,
    "por": _rows_por,
    "sas7bdat": _rows_sas,
    "xpt": _rows_xpt,
}


def metadata_df(spark, path: str):
    """The canonical 12-column metadata DataFrame (identical schema for
    every format — reference src/metadata_df.rs:184-197)."""
    ext, meta = _load(str(path))
    return spark.createDataFrame(list(_ROWS[ext](meta)), METADATA_DF_SCHEMA)


def metadata_dict(path: str) -> dict:
    """File + per-variable metadata dict (reference
    readstat_metadata_json, src/lib.rs:486-502)."""
    ext, meta = _load(str(path))
    if ext == "dta":
        variables = []
        for v in meta.variables:
            labels = meta.value_labels.get(v.lblname, {}) if v.lblname else {}
            variables.append(
                {
                    "name": v.name,
                    "label": v.varlabel or None,
                    "type": v.kind,
                    "format": v.fmt or None,
                    "value_label_set": v.lblname or None,
                    "value_labels": {str(k): lab for k, lab in labels.items()},
                    "storage_width": v.width,
                }
            )
        return {
            "row_count": meta.nobs,
            "var_count": meta.nvar,
            "version": meta.version,
            "encoding": meta.encoding,
            "file_label": meta.data_label or None,
            "timestamp": meta.timestamp or None,
            "variables": variables,
        }
    if ext == "sav":
        return {
            "row_count": meta.nobs,
            "var_count": len(meta.variables),
            "encoding": meta.encoding,
            "file_label": meta.file_label or None,
            "compression": {0: "none", 1: "bytecode", 2: "zlib"}.get(
                meta.compression
            ),
            "variables": [
                {
                    "name": v.name,
                    "label": v.label or None,
                    "type": "str" if v.is_str else "numeric",
                    "format": v.fmt or None,
                    "measure": _MEASURE.get(v.measure),
                    "value_labels": {str(k): lab for k, lab in v.value_labels.items()},
                    "storage_width": v.string_len if v.is_str else 8,
                }
                for v in meta.variables
            ],
        }
    if ext == "por":
        return {
            "row_count": None,
            "var_count": len(meta.variables),
            "file_label": meta.file_label or None,
            "variables": [
                {
                    "name": v.name,
                    "label": v.label or None,
                    "type": "str" if v.is_str else "numeric",
                    "value_labels": {str(k): lab for k, lab in v.value_labels.items()},
                    "storage_width": v.width if v.is_str else 8,
                }
                for v in meta.variables
            ],
        }
    if ext == "sas7bdat":
        return {
            "row_count": meta.row_count,
            "var_count": len(meta.columns),
            "encoding": meta.encoding,
            "file_label": getattr(meta, "dataset_label", None) or None,
            "variables": [
                {
                    "name": c.name,
                    "label": c.label or None,
                    "type": "str" if c.ctype == "s" else "numeric",
                    "format": c.fmt or None,
                    "storage_width": c.width,
                }
                for c in meta.columns
            ],
        }
    return {
        "row_count": meta.n_rows,
        "var_count": len(meta.variables),
        "file_label": None,
        "dataset_name": meta.dataset_name or None,
        "variables": [
            {
                "name": v.name,
                "label": v.label or None,
                "type": "numeric" if v.is_numeric else "str",
                "format": v.fmt or None,
                "storage_width": v.width,
            }
            for v in meta.variables
        ],
    }
