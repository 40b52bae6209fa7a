"""Metadata surface (SURVEY.md §1.4).

Three shapes, mirroring the reference:
1. ``metadata_dict(path)`` — JSON-able dict with file info + per-
   variable entries (reference readstat_metadata_json, src/lib.rs:486-502)
2. ``metadata_df(spark, path)`` — the canonical 12-column per-variable
   DataFrame, identical schema for all formats
   (reference src/metadata_df.rs:3-8, :184-197)
3. StructField.metadata on the scan schema (label / format /
   value_label), attached by the data source itself.
"""

from __future__ import annotations

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


def _load_meta(path: str):
    from polars_readstat_spark.sources.dta.meta import parse_dta_meta

    if not path.lower().endswith(".dta"):
        raise NotImplementedError(f"metadata: unsupported format for {path}")
    return parse_dta_meta(path)


def metadata_dict(path: str) -> dict:
    meta = _load_meta(path)
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


def metadata_df(spark, path: str):
    """The canonical 12-column metadata DataFrame (identical schema for
    every format — reference src/metadata_df.rs:184-197)."""
    meta = _load_meta(path)
    rows = []
    for v in meta.variables:
        labels = meta.value_labels.get(v.lblname, {}) if v.lblname else {}
        ftype, fwidth, fdec = _parse_fmt(v.fmt) if v.fmt else (None, None, None)
        rows.append(
            (
                v.name,
                v.varlabel or None,
                [str(k) for k in labels] or None,
                [labels[k] for k in labels] or None,
                v.fmt or None,
                ftype,
                fwidth,
                fdec,
                None,  # measure: SPSS-only concept
                None,  # display_width: SPSS-only
                None,  # alignment: SPSS-only
                v.width if v.kind == "str" else None,
            )
        )
    return spark.createDataFrame(rows, METADATA_DF_SCHEMA)
