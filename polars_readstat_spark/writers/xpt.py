"""SAS Transport (.xpt) v5 writer — reference W4 re-expressed.

Public spec: SAS Technical Note TS-140 ("The Record Layout of a SAS
Transport Data Set"): 80-byte header records, 140-byte NAMESTR
descriptors (big-endian), fixed-width row-major records, IBM
System/370 hexadecimal floats, blank-padded to 80-byte boundaries.

Same two-phase Spark shape as the other writers: a pre-pass
aggregation for string widths + row count, then a partition-ordered
Arrow-chunk stream packed vectorized per batch. IEEE→IBM is
exact (56-bit hex mantissa ⊇ 53-bit IEEE) and fully numpy-vectorized.

Reference parity: src/sas/xpt_writer.rs (v5 limits: 8-char upper-case
names, 40-char labels, numerics 8 bytes, '.' missing).
"""

from __future__ import annotations

import datetime
import struct

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_readstat_spark.writers import str_cell_matrix, ts_epoch_seconds
from polars_readstat_spark.writers.tagged import (
    NO_TAG as _TAG_NONE,
    parse_tag_offsets as _parse_tag_offsets,
    xpt_tag_byte0 as _xpt_tag_byte0,
)

# SAS epoch 1960-01-01 relative to Unix epoch
SAS_DAY_SHIFT = 3653
SAS_SEC_SHIFT = 315_619_200


def _pad80(b: bytes) -> bytes:
    return b + b" " * ((-len(b)) % 80)


def _hdr(tag: str, tail: str = "0" * 30) -> bytes:
    s = f"HEADER RECORD*******{tag:<8}HEADER RECORD!!!!!!!{tail}"
    return s.encode("ascii").ljust(80)


def _short_names(names: list[str]) -> list[str]:
    out, seen = [], set()
    for i, n in enumerate(names):
        base = "".join(c for c in n.upper() if c.isalnum() or c == "_")
        base = base or f"VAR{i + 1}"
        if base[0].isdigit():
            base = "V" + base
        cand = base[:8]
        k = 1
        while cand in seen:
            sfx = str(k)
            cand = base[: 8 - len(sfx)] + sfx
            k += 1
        seen.add(cand)
        out.append(cand)
    return out


def ieee_to_ibm(vals: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(n,) float64 + missing mask → (n, 8) uint8 IBM/370 doubles.

    IBM layout: sign bit, 7-bit base-16 exponent (bias 64), 56-bit hex
    mantissa, value = 0.mantissa × 16^(exp-64). Missing = 0x2E ('.')
    in byte 0, zero mantissa (TS-140 convention, matches our reader's
    ibm_to_ieee inverse)."""
    n = vals.shape[0]
    out = np.zeros((n, 8), dtype=np.uint8)
    v = np.where(mask, 0.0, vals)
    neg = v < 0
    m = np.abs(v)
    nonzero = (m > 0) & np.isfinite(m)

    f, e2 = np.frexp(m)  # m = f * 2^e2, f in [0.5, 1)
    e16 = np.ceil(e2 / 4.0).astype(np.int64)
    shift = 4 * e16 - e2  # 0..3
    frac = f / np.power(2.0, shift)  # in [1/32, 1) → wait: [0.03125,1)
    mant = np.round(frac * float(1 << 56)).astype(np.uint64)
    # rounding overflow: mantissa hit 2^56 → renormalize one hex digit
    ovf = mant >= np.uint64(1 << 56)
    if ovf.any():
        mant[ovf] >>= np.uint64(4)
        e16[ovf] += 1
    eb = e16 + 64
    # IBM hex-float range is 16^-65 .. ~7.24e75 — narrower than IEEE
    # double on both ends. Below it, flush to zero (standard underflow);
    # above it there is nothing valid to write, so refuse loudly rather
    # than wrap the exponent into a wrong finite value.
    over = nonzero & (eb > 127)
    if over.any():
        bad = float(np.max(m[over]))
        raise ValueError(
            f"write_xpt: magnitude {bad:.6g} exceeds the IBM/370 double "
            "range (~7.24e75) used by the xpt transport format"
        )
    nonzero &= eb >= 0
    expb = np.where(nonzero, np.clip(eb, 0, 127), 0).astype(np.uint64)
    b0 = (neg.astype(np.uint64) << np.uint64(7)) | np.where(nonzero, expb, 0)
    out[:, 0] = b0.astype(np.uint8)
    for i in range(7):
        out[:, 1 + i] = (
            (mant >> np.uint64(8 * (6 - i))) & np.uint64(0xFF)
        ).astype(np.uint8)
    out[~nonzero] = 0
    out[~nonzero, 0] = np.where(neg[~nonzero], 0x80, 0)
    out[mask] = 0
    out[mask, 0] = 0x2E  # '.'
    return out


def write_xpt(
    df: DataFrame,
    path: str,
    dataset_name: str = "DATA",
    variable_labels: dict | None = None,
    version: int = 5,
    tagged_missing: dict | None = None,
) -> None:
    """version=8 writes the V8 transport layout (public "Record Layout
    of a SAS Version 8 or 9 Data Set in SAS Transport Format"): LIBV8/
    MEMBV8/NAMSTV8/OBSV8 header tags plus a LABELV8 section carrying
    names up to 32 chars and labels up to 256 — the same records our
    reader's LABELV8 parser consumes."""
    if version not in (5, 8):
        raise ValueError("write_xpt: version must be 5 or 8")
    variable_labels = variable_labels or {}
    tagged_missing = dict(tagged_missing or {})
    ind_names = list(dict.fromkeys(tagged_missing.values()))
    data_df = df.drop(*ind_names) if ind_names else df
    fields, names, shorts, kinds, aggs = _xpt_columns(data_df)
    for vcol, icol in tagged_missing.items():
        if vcol not in names or kinds[names.index(vcol)] == "str":
            raise ValueError(
                f"tagged_missing: {vcol!r} is not a numeric data column"
            )
        if icol not in df.columns:
            raise ValueError(
                f"tagged_missing: indicator column {icol!r} not in DataFrame"
            )
    stats = df.agg(*aggs).collect()[0].asDict()
    widths = _xpt_widths(fields, kinds, stats)
    record_width = sum(widths)
    ncols = len(names)
    tag_slot = {names.index(v): ncols + ind_names.index(i)
                for v, i in tagged_missing.items()}

    out = _xpt_header(
        fields, shorts, kinds, widths, dataset_name, variable_labels, version
    )
    src = _xpt_cast(
        df, fields, kinds,
        extra=[F.col(c).cast("string").alias(f"__tag_{i}")
               for i, c in enumerate(ind_names)],
    )

    # packing (incl. IEEE→IBM) runs on the executors; the driver only
    # concatenates fixed-width records in partition order. Big exports
    # take the all-cores JVM-tagged protocol (see iter_ordered_packed;
    # same ≥100k-row policy as the por/sav writers).
    from polars_readstat_spark.writers import iter_packed_chunks

    kinds_l, widths_l = list(kinds), list(widths)
    tag_slot_l, ncols_l, rw = dict(tag_slot), ncols, record_width

    def pack_fn(pdf):
        cols = [pdf.iloc[:, i] for i in range(pdf.shape[1])]
        tags = None
        if tag_slot_l:
            tags = [
                _parse_tag_offsets(cols[tag_slot_l[ci]].tolist())
                if ci in tag_slot_l
                else None
                for ci in range(ncols_l)
            ]
        return _pack_xpt(cols[:ncols_l], kinds_l, widths_l, rw, tags)

    from polars_readstat_spark.sources.fs import fs_open_output

    from polars_readstat_spark.writers import iter_ordered_packed

    xpt_mods = (
        "polars_readstat_spark.writers.xpt",
        "polars_readstat_spark.writers.tagged",
        "polars_readstat_spark.writers",
    )
    tag_exprs = [
        F.col(c).cast("string").alias(f"__tag_{i}")
        for i, c in enumerate(ind_names)
    ]
    # wide protocol: cast AFTER the repartition (guide §2.3) — the
    # range-bounds sampling pass then re-executes only the bare scan
    # + order tags, not the date/double casts (same fix as sav)
    chunks = (
        iter_ordered_packed(
            df, pack_fn, 8192, modules=xpt_mods,
            cast=lambda b: _xpt_cast(
                b, fields, kinds,
                extra=tag_exprs
                + [F.col("__prs_mid"), F.col("__prs_cid")],
            ),
        )
        if int(stats["__n"]) >= 100_000
        else iter_packed_chunks(src, pack_fn, 8192, modules=xpt_mods)
    )
    with fs_open_output(path) as fh:
        fh.write(bytes(out))
        total = 0
        for payload, _n in chunks:
            fh.write(payload)
            total += len(payload)
        fh.write(b" " * ((-total) % 80))


def _xpt_columns(df: DataFrame):
    fields = df.schema.fields
    names = [f.name for f in fields]
    shorts = _short_names(names)
    kinds = []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        t = f.dataType.simpleString()
        if t == "string":
            kinds.append("str")
            aggs.append(F.max(F.octet_length(f.name)).alias(f"__w_{f.name}"))
        elif t == "date":
            kinds.append("date")
        elif t.startswith("timestamp"):
            kinds.append("datetime")
        elif t == "bigint" and f.metadata.get("time") == "ns_since_midnight":
            kinds.append("time")
        else:
            kinds.append("num")
    return fields, names, shorts, kinds, aggs


def _xpt_widths(fields, kinds, stats) -> list[int]:
    widths = []
    for f, k in zip(fields, kinds):
        if k == "str":
            w = max(int(stats.get(f"__w_{f.name}") or 1), 1)
            if w > 200:
                raise ValueError(
                    f"write_xpt: column {f.name} wider than 200 bytes "
                    "(v5 transport char limit)"
                )
            widths.append(w)
        else:
            widths.append(8)
    return widths


def _xpt_header(
    fields, shorts, kinds, widths, dataset_name, variable_labels, version
) -> bytearray:
    now = datetime.datetime.now()
    ts = now.strftime("%d%b%y:%H:%M:%S").upper()

    v8 = version == 8
    tag_lib = "LIBV8" if v8 else "LIBRARY"
    tag_mem = "MEMBV8" if v8 else "MEMBER"
    tag_dsc = "DSCPTV8" if v8 else "DSCRPTR"
    tag_nam = "NAMSTV8" if v8 else "NAMESTR"
    sasver = "8.2" if v8 else "6.06"
    out = bytearray()
    out += _hdr(tag_lib)
    out += (
        f"{'SAS':<8}{'SAS':<8}{'SASLIB':<8}{sasver:<8}{'Linux':<8}"
        + " " * 24 + f"{ts:<16}"
    ).encode("ascii").ljust(80)
    out += f"{ts:<16}".encode("ascii").ljust(80)
    out += _hdr(tag_mem, "0" * 16 + "0160" + "0" * 7 + "140" + "  ")
    out += _hdr(tag_dsc)
    dsname = (dataset_name or "DATA").upper()[: (32 if v8 else 8)]
    out += (
        f"{'SAS':<8}{dsname:<8.8}{'SASDATA':<8}{sasver:<8}{'Linux':<8}"
        + " " * 24 + f"{ts:<16}"
    ).encode("ascii").ljust(80)
    out += (f"{ts:<16}" + " " * 16).encode("ascii").ljust(80)
    out += _hdr(tag_nam, "0" * 6 + f"{len(fields):04d}" + "0" * 20)

    pos = 0
    for i, f in enumerate(fields):
        k = kinds[i]
        ntype = 2 if k == "str" else 1
        fmt = {"date": "DATE", "datetime": "DATETIME", "time": "TIME"}.get(k, "")
        fl = {"date": 9, "datetime": 20, "time": 8}.get(k, 0)
        label = (variable_labels.get(f.name) or f.metadata.get("label") or "")[:40]
        ns = struct.pack(
            ">hhhh", ntype, 0, widths[i], i + 1
        )
        ns += shorts[i].ljust(8).encode("ascii")
        ns += label.ljust(40)[:40].encode("ascii", "replace")
        ns += fmt.ljust(8).encode("ascii")
        ns += struct.pack(">hhhh", fl, 0, 0, 0)
        ns += b" " * 8  # informat name
        ns += struct.pack(">hh", 0, 0)
        ns += struct.pack(">i", pos)
        ns += b"\x00" * 52
        assert len(ns) == 140
        out += ns
        pos += widths[i]
    out += b" " * ((-(140 * len(fields))) % 80)
    if v8:
        # LABELV8: names up to 32 / labels up to 256, packed
        # back-to-back across 80-byte records (public v8 layout; our
        # reader's LABELV8 parser is the inverse)
        entries = []
        for i, f in enumerate(fields):
            label = (
                variable_labels.get(f.name) or f.metadata.get("label") or ""
            )
            if len(f.name) > 8 or len(label) > 40:
                nm = f.name.encode("ascii", "replace")[:32]
                lb = label.encode("ascii", "replace")[:256]
                entries.append(
                    struct.pack(">3h", i + 1, len(nm), len(lb)) + nm + lb
                )
        if entries:
            out += _hdr("LABELV8", f"{len(entries):>5}".replace(" ", "0") + "0" * 25)
            blob = b"".join(entries)
            out += blob + b" " * ((-len(blob)) % 80)
        out += _hdr("OBSV8", "0" * 30)
    else:
        out += _hdr("OBS")
    return out


def _xpt_cast(df: DataFrame, fields, kinds, extra=()) -> DataFrame:
    sel = []
    for f, k in zip(fields, kinds):
        c = F.col(f.name)
        if k == "num":
            sel.append(c.cast("double").alias(f.name))
        elif k == "date":
            sel.append((F.unix_date(c) + SAS_DAY_SHIFT).cast("double").alias(f.name))
        elif k == "datetime":
            sel.append((ts_epoch_seconds(c) + float(SAS_SEC_SHIFT)).alias(f.name))
        elif k == "time":
            sel.append((c.cast("double") / 1e9).alias(f.name))
        else:
            sel.append(c.alias(f.name))
    return df.select(*sel, *extra)


def _pack_xpt(cols_data, kinds, widths, record_width, tags_data=None) -> bytes:
    """Column-wise pack into blank-padded fixed-width records; numerics
    go through the vectorized IEEE→IBM converter. tags_data: optional
    per-column tag-offset arrays (writers/tagged.py) — tagged rows
    write the tag char in byte 0 over a zeroed field."""
    n = len(cols_data[0]) if cols_data else 0
    mat = np.full((n, record_width), 0x20, dtype=np.uint8)
    off = 0
    for ci, (col, k, w) in enumerate(zip(cols_data, kinds, widths)):
        if k == "str":
            # UTF-8, truncated at a character boundary (the xpt
            # container is raw bytes with no declared charset, and
            # UTF-8 is what modern SAS sessions and our reader's
            # auto-detection expect); encoded once per distinct value
            mat[:, off : off + w] = str_cell_matrix(
                col, w, utf8_boundary=True
            )
        else:
            try:  # pandas Series from the distributed path
                vals = col.to_numpy(dtype="float64", na_value=np.nan)
            except AttributeError:
                vals = np.array(
                    [np.nan if v is None else v for v in col], dtype=np.float64
                )
            mask = np.isnan(vals)
            mat[:, off : off + 8] = ieee_to_ibm(vals, mask)
            offs = tags_data[ci] if tags_data else None
            if offs is not None:
                tagged = offs != _TAG_NONE
                if tagged.any():
                    mat[tagged, off : off + 8] = 0
                    mat[tagged, off] = _xpt_tag_byte0(offs[tagged])
        off += w
    return mat.tobytes()
