"""Stata .dta writer (v118 layout) — reference W1/W2 re-expressed.

Two Spark jobs, then a streaming assembly:

1. **Pre-pass** (one aggregation job): per-column max UTF-8 byte
   widths for strings, min/max for bigint downcast decisions, and the
   row count — the Spark shape of the reference's sink pre-pass
   (pybindings.rs:996-1047).
2. **Pack**: batches are packed vectorized (numpy structured array per
   batch). The driver-side `write_dta` pulls partitions in order via
   `toLocalIterator()`; the distributed path
   (writers/partitioned.py) runs the same pack+assemble inside each
   executor task against its own partition, with the column plan from
   the global pre-pass so every part-file shares one schema.

Layout per the public dta-118 spec (same section tags the reader
parses). Nulls → Stata sentinel missings; date → %td day numbers;
timestamp → %tc ms. Strings up to 2045 bytes are written as fixed
str#; wider columns become strL: data rows carry (v,o) refs and the
payloads stream into a <strls> GSO section (see _pack_batch and the
strL block below).
"""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_readstat_spark.sources.dta.decode import (
    STATA_EPOCH_DAYS,
    STATA_EPOCH_MS,
)
from polars_readstat_spark.writers.tagged import (
    NO_TAG as _TAG_NONE,
    parse_tag_offsets as _parse_tag_offsets,
)

_MISS = {
    "byte": 101,
    "int": 32741,
    "long": 2147483621,
}
_FLOAT_MISS_BITS = 0x7F000000
_DOUBLE_MISS_BITS = 0x7FE0000000000000
# smallest float/double interpreted as a missing code on read
_FLOAT_MISS_VALUE = struct.unpack("<f", struct.pack("<I", _FLOAT_MISS_BITS))[0]
_DOUBLE_MISS_VALUE = struct.unpack("<d", struct.pack("<Q", _DOUBLE_MISS_BITS))[0]
# largest magnitude a double holds exactly for every integer
_DOUBLE_EXACT_INT = 1 << 53
# µs from 1970-01-01 back to the Stata epoch (1960-01-01)
_STATA_EPOCH_US = -315_619_200_000_000


def _plan_columns(df: DataFrame):
    """→ list of (name, stata_kind, spark_conv) and the pre-pass aggs."""
    plan = []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("tinyint", "smallint", "int", "bigint"):
            # integer widths are decided by the pre-pass range: Stata
            # reserves the top of each integer range for missing
            # sentinels (byte > 100, int > 32740, long > 2147483620),
            # so e.g. an int32 column holding 2147483645 must widen to
            # the next Stata type or the value reads back as missing.
            # Each Spark type keeps its natural Stata floor (stable
            # roundtrip dtypes); the pre-pass only ever promotes.
            floor = {
                "tinyint": "byte",
                "smallint": "int",
                "int": "long",
                "bigint": "long",
            }[t]
            plan.append((f.name, f"{floor}?"))
            aggs.append(F.min(f.name).alias(f"__min_{f.name}"))
            aggs.append(F.max(f.name).alias(f"__max_{f.name}"))
        elif t == "float":
            # Stata float reserves bit patterns >= 0x7F000000
            # (~1.7014e38) for missing codes, but float32 values run to
            # 3.4e38 — the pre-pass promotes such columns to double
            # (exact for every float32)
            plan.append((f.name, "float?"))
            aggs.append(F.min(f.name).alias(f"__min_{f.name}"))
            aggs.append(F.max(f.name).alias(f"__max_{f.name}"))
        elif t == "double":
            plan.append((f.name, "double"))
        elif t == "boolean":
            plan.append((f.name, "byte"))
        elif t == "date":
            plan.append((f.name, "date"))
        elif t in ("timestamp", "timestamp_ntz"):
            plan.append((f.name, "datetime"))
        elif t == "string":
            plan.append((f.name, "str"))
            aggs.append(
                F.max(F.octet_length(f.name)).alias(f"__w_{f.name}")
            )
        else:
            raise ValueError(f"write_dta: unsupported column type {t} ({f.name})")
    return plan, aggs


def _finalize_cols(plan, stats) -> list[tuple]:
    """Pre-pass stats → concrete (name, kind, width, fmt) per column."""
    cols = []
    _INT_ORDER = ("byte", "int", "long")
    _FITS = {
        "byte": (-127, 100),
        "int": (-32767, 32740),
        "long": (-2147483647, 2147483620),
    }
    for name, kind in plan:
        if kind == "float?":
            hi = stats.get(f"__max_{name}")
            lo = stats.get(f"__min_{name}")
            kind = "float"
            if hi is not None and (
                hi >= _FLOAT_MISS_VALUE or lo <= -_FLOAT_MISS_VALUE
            ):
                kind = "double"
        elif kind.endswith("?"):
            # smallest Stata integer type at or above the floor whose
            # NONMISSING range holds the observed values (all-null →
            # floor); doubles hold anything the integer types can't
            floor = kind[:-1]
            lo = stats.get(f"__min_{name}")
            hi = stats.get(f"__max_{name}")
            kind = floor
            if lo is not None and hi is not None:
                for cand in _INT_ORDER[_INT_ORDER.index(floor):]:
                    flo, fhi = _FITS[cand]
                    if lo >= flo and hi <= fhi:
                        kind = cand
                        break
                else:
                    # Stata has no int64; values past long fall back to
                    # double, which is exact only up to 2^53. Refuse
                    # loudly beyond that (mirrors the double
                    # missing-code guard) instead of silently changing
                    # values on roundtrip.
                    if lo < -_DOUBLE_EXACT_INT or hi > _DOUBLE_EXACT_INT:
                        raise ValueError(
                            f"write_dta: column {name!r} holds integers "
                            f"outside ±2^53 ({lo}..{hi}); Stata's widest "
                            "numeric type (double) cannot represent them "
                            "exactly — rescale or split the column first"
                        )
                    kind = "double"
        if kind == "str":
            w = max(int(stats.get(f"__w_{name}") or 0), 1)
            if w > 2045:
                # wide text → strL: data cells hold (v, o) refs into
                # the GSO section (public dta-118 spec; our reader's
                # build_strl_lookup inverse)
                cols.append((name, "strl", 8, "%9s"))
            else:
                cols.append((name, "str", w, f"%{max(w, 9)}s"))
        elif kind == "byte":
            cols.append((name, "byte", 1, "%8.0g"))
        elif kind == "int":
            cols.append((name, "int", 2, "%8.0g"))
        elif kind == "long":
            cols.append((name, "long", 4, "%12.0g"))
        elif kind == "float":
            cols.append((name, "float", 4, "%9.0g"))
        elif kind == "double":
            cols.append((name, "double", 8, "%10.0g"))
        elif kind == "date":
            cols.append((name, "date", 4, "%td"))
        elif kind == "datetime":
            cols.append((name, "datetime", 8, "%tc"))
    return cols


_TYPECODE = {
    "str": None,  # width
    "strl": 32768,
    "byte": 65530,
    "int": 65529,
    "long": 65528,
    "float": 65527,
    "double": 65526,
    "date": 65528,  # long + %td
    "datetime": 65526,  # double + %tc
}


def _rec_dtype(cols) -> np.dtype:
    dtype_fields = []
    for i, (name, kind, w, fmt) in enumerate(cols):
        if kind == "str":
            dtype_fields.append((f"f{i}", f"S{w}"))
        elif kind == "strl":
            dtype_fields.append((f"f{i}", "<u8"))
        elif kind == "byte":
            dtype_fields.append((f"f{i}", "<i1"))
        elif kind == "int":
            dtype_fields.append((f"f{i}", "<i2"))
        elif kind in ("long", "date"):
            dtype_fields.append((f"f{i}", "<i4"))
        elif kind == "float":
            dtype_fields.append((f"f{i}", "<f4"))
        else:
            dtype_fields.append((f"f{i}", "<f8"))
    return np.dtype(dtype_fields)


def _apply_tags(rec_field, kind, offs) -> None:
    """Overwrite tagged rows with Stata's .a-.z sentinel for the
    column's storage type (the exact inverse of decode_numeric,
    sources/dta/decode.py:57-97): integers add the offset to the
    missing base, float/double add it at the tag bit position."""
    tagged = offs != _TAG_NONE
    if not tagged.any():
        return
    off = offs[tagged].astype(np.int64)
    if kind in ("byte", "int", "long", "date"):
        base = _MISS["long"] if kind == "date" else _MISS[kind]
        rec_field[tagged] = (base + off).astype(rec_field.dtype)
    elif kind == "float":
        rec_field.view("<u4")[tagged] = (
            _FLOAT_MISS_BITS + (off << 11)
        ).astype("<u4")
    else:  # double, datetime
        rec_field.view("<u8")[tagged] = (
            _DOUBLE_MISS_BITS + (off << 40)
        ).astype("<u8")


def _pack_batch(
    cols, rec_dtype, pdf, row_start: int, strls_buf: bytearray,
    tag_offsets: dict | None = None,
) -> bytes:
    n = len(pdf)
    rec = np.zeros(n, dtype=rec_dtype)
    for i, (name, kind, w, fmt) in enumerate(cols):
        s = pdf[name]
        if kind == "strl":
            # v118 cell: uint64 LE = v | (o << 16); one GSO per
            # non-empty value, keyed (v=col 1-based, o=row 1-based)
            keys = np.zeros(n, dtype="<u8")
            vals = s.fillna("").astype(str)
            for r, text in enumerate(vals):
                if text == "":
                    continue  # key 0 → ""
                v_, o_ = i + 1, row_start + r + 1
                keys[r] = v_ | (o_ << 16)
                payload = text.encode("utf-8") + b"\x00"
                strls_buf.extend(
                    b"GSO"
                    + struct.pack("<IQ", v_, o_)
                    + bytes([130])
                    + struct.pack("<I", len(payload))
                    + payload
                )
            rec[f"f{i}"] = keys
        elif kind == "str":
            vals = s.fillna("").astype(str)
            rec[f"f{i}"] = np.array(
                [v.encode("utf-8")[:w] for v in vals], dtype=f"S{w}"
            )
        elif kind in ("byte", "int", "long"):
            miss = _MISS[kind]
            v = s.astype("float64")
            nulls = v.isna().values
            iv = np.where(nulls, miss, v.fillna(0).values).astype(
                {"byte": "<i1", "int": "<i2", "long": "<i4"}[kind]
            )
            rec[f"f{i}"] = iv
        elif kind == "date":
            nulls = s.isna().values
            days = np.array(
                [
                    0 if x is None else x.toordinal() - 719163
                    for x in s
                ],
                dtype="<i4",
            )
            rec[f"f{i}"] = np.where(
                nulls, _MISS["long"], days - STATA_EPOCH_DAYS
            ).astype("<i4")
        elif kind == "datetime":
            nulls = s.isna().values
            miss = np.frombuffer(
                struct.pack("<Q", _DOUBLE_MISS_BITS), dtype="<f8"
            )[0]
            v = np.full(n, miss, dtype="<f8")
            ss = s
            if getattr(ss.dtype, "tz", None) is not None:
                # wall-clock semantics, matching the scalar path's
                # tzinfo strip
                ss = ss.dt.tz_localize(None)
            elif ss.dtype == object and any(
                getattr(x, "tzinfo", None) is not None
                for x in ss if x is not None
            ):
                # object batches can hide tz-aware datetimes, and
                # numpy's datetime64 coercion silently converts those
                # to UTC (DeprecationWarning only) — strip tzinfo
                # first so they keep the wall-clock semantics of the
                # tz-dtype branch above
                ss = ss.map(
                    lambda x: x.replace(tzinfo=None)
                    if getattr(x, "tzinfo", None) is not None
                    else x
                )
            try:
                # vectorized fast path: any datetime64 unit (and object
                # arrays of datetimes, full year 1-9999 range — µs
                # resolution spans ±290k years, so nothing %tc can
                # express overflows it). Exact integer µs math, then
                # split into whole ms + fractional µs like the scalar
                # path.
                us = ss.values.astype("datetime64[us]").astype("<i8")
                q, rem = np.divmod(us - _STATA_EPOCH_US, 1000)
                live = ~nulls
                v[live] = (
                    q[live].astype("<f8") + rem[live].astype("<f8") / 1000.0
                )
            except (TypeError, ValueError):
                # exotic object batches numpy can't coerce — per-row
                import datetime as _dt

                epoch = _dt.datetime(1960, 1, 1)
                for r, x in enumerate(ss):
                    if nulls[r]:
                        continue
                    xp = (
                        x.to_pydatetime()
                        if hasattr(x, "to_pydatetime")
                        else x
                    )
                    if xp.tzinfo is not None:
                        xp = xp.replace(tzinfo=None)
                    d = xp - epoch
                    v[r] = (
                        d.days * 86_400_000.0
                        + d.seconds * 1_000.0
                        + d.microseconds / 1_000.0
                    )
            rec[f"f{i}"] = v
        elif kind == "float":
            v = s.astype("float32").values.copy()
            nulls = s.isna().values
            if nulls.any():
                v.view("<u4")[nulls] = _FLOAT_MISS_BITS
            rec[f"f{i}"] = v
        else:  # double
            v = s.astype("float64").values.copy()
            nulls = s.isna().values
            live = v[~nulls]
            if live.size and float(np.max(live)) >= _DOUBLE_MISS_VALUE:
                # 0x7FE0... and above are Stata missing codes; there is
                # no wider numeric type to promote to, so refuse rather
                # than silently returning missing on read
                raise ValueError(
                    f"write_dta: column {name!r} holds values >= "
                    f"{_DOUBLE_MISS_VALUE:.6g}, Stata's double "
                    "missing-code threshold; rescale the column first"
                )
            if nulls.any():
                v.view("<u8")[nulls] = _DOUBLE_MISS_BITS
            rec[f"f{i}"] = v
        if tag_offsets and name in tag_offsets:
            _apply_tags(rec[f"f{i}"], kind, tag_offsets[name])
    return rec.tobytes()


def _pack_stream(
    cols, pdf_iter, tagged_missing: dict | None = None
) -> tuple[bytearray, bytearray, int]:
    """Pack an iterator of pandas batches → (data, strls, n_rows).
    tagged_missing: value column → indicator column (both must be in
    each batch; the indicator column is consumed, not packed)."""
    parse_tag_offsets = _parse_tag_offsets

    rec_dtype = _rec_dtype(cols)
    data = bytearray()
    strls = bytearray()
    pos = 0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        tag_offsets = None
        if tagged_missing:
            tag_offsets = {
                vcol: parse_tag_offsets(pdf[icol].tolist())
                for vcol, icol in tagged_missing.items()
            }
            for offs in tag_offsets.values():
                if (offs == 27).any():
                    raise ValueError(
                        "tagged_missing: Stata has no '._' tag "
                        "(only '.' and '.a'-'.z')"
                    )
        data += _pack_batch(cols, rec_dtype, pdf, pos, strls, tag_offsets)
        pos += len(pdf)
    return data, strls, pos


def _assemble_dta(
    cols,
    data: bytes,
    strls: bytes,
    n_rows: int,
    data_label: str,
    variable_labels: dict,
    value_labels: dict,
) -> bytearray:
    """Metadata sections + packed data → complete dta-118 file bytes."""

    def pad(b: bytes, n: int) -> bytes:
        return b[:n] + b"\x00" * (n - len(b))

    K, N = len(cols), n_rows
    out = bytearray()
    out += b"<stata_dta><header><release>118</release><byteorder>LSF</byteorder><K>"
    out += struct.pack("<H", K)
    out += b"</K><N>"
    out += struct.pack("<Q", N)
    out += b"</N><label>"
    lbl = data_label.encode("utf-8")[:80]
    out += struct.pack("<H", len(lbl)) + lbl
    out += b"</label><timestamp>"
    ts = b"13 Aug 2026 00:00"
    out += bytes([len(ts)]) + ts
    out += b"</timestamp></header>"

    map_pos = len(out) + len(b"<map>")
    out += b"<map>" + b"\x00" * (14 * 8) + b"</map>"

    offsets = [0] * 14
    offsets[0] = 0
    offsets[1] = map_pos - len(b"<map>")

    offsets[2] = len(out)
    out += b"<variable_types>"
    for name, kind, w, fmt in cols:
        out += struct.pack("<H", w if kind == "str" else _TYPECODE[kind])
    out += b"</variable_types>"

    offsets[3] = len(out)
    out += b"<varnames>"
    for name, *_ in cols:
        out += pad(name.encode("utf-8"), 129)
    out += b"</varnames>"

    offsets[4] = len(out)
    out += b"<sortlist>" + b"\x00" * (2 * (K + 1)) + b"</sortlist>"

    offsets[5] = len(out)
    out += b"<formats>"
    for name, kind, w, fmt in cols:
        out += pad(fmt.encode(), 57)
    out += b"</formats>"

    offsets[6] = len(out)
    out += b"<value_label_names>"
    for name, *_ in cols:
        lab = name if name in value_labels else ""
        out += pad(lab.encode("utf-8"), 129)
    out += b"</value_label_names>"

    offsets[7] = len(out)
    out += b"<variable_labels>"
    for name, *_ in cols:
        out += pad(variable_labels.get(name, "").encode("utf-8"), 321)
    out += b"</variable_labels>"

    offsets[8] = len(out)
    out += b"<characteristics></characteristics>"

    offsets[9] = len(out)
    out += b"<data>"
    out += data
    out += b"</data>"

    offsets[10] = len(out)
    out += b"<strls>" + bytes(strls) + b"</strls>"

    offsets[11] = len(out)
    out += b"<value_labels>"
    for name, *_ in cols:
        if name not in value_labels:
            continue
        labels = value_labels[name]
        keys = sorted(labels)
        txt = bytearray()
        offs = []
        for k in keys:
            offs.append(len(txt))
            txt += labels[k].encode("utf-8") + b"\x00"
        table = (
            struct.pack("<ii", len(keys), len(txt))
            + b"".join(struct.pack("<i", o) for o in offs)
            + b"".join(struct.pack("<i", int(k)) for k in keys)
            + bytes(txt)
        )
        out += b"<lbl>"
        out += struct.pack("<i", len(table))
        out += pad(name.encode("utf-8"), 129) + b"\x00\x00\x00"
        out += table
        out += b"</lbl>"
    out += b"</value_labels>"

    offsets[12] = len(out)
    out += b"</stata_dta>"
    offsets[13] = len(out)

    out[map_pos : map_pos + 14 * 8] = struct.pack("<14Q", *offsets)
    return out


def write_dta(
    df: DataFrame,
    path: str,
    *,
    data_label: str = "",
    variable_labels: dict[str, str] | None = None,
    value_labels: dict[str, dict[int, str]] | None = None,
    tagged_missing: dict[str, str] | None = None,
) -> None:
    variable_labels = variable_labels or {}
    value_labels = value_labels or {}
    tagged_missing = dict(tagged_missing or {})

    ind_names = list(dict.fromkeys(tagged_missing.values()))
    data_df = df.drop(*ind_names) if ind_names else df
    plan, aggs = _plan_columns(data_df)
    stats = df.agg(*aggs).collect()[0].asDict()
    cols = _finalize_cols(plan, stats)
    kinds_by_name = {c[0]: c[1] for c in cols}
    for vcol, icol in tagged_missing.items():
        if kinds_by_name.get(vcol) in (None, "str", "strl"):
            raise ValueError(
                f"tagged_missing: {vcol!r} is not a numeric data column"
            )
        if icol not in df.columns:
            raise ValueError(
                f"tagged_missing: indicator column {icol!r} not in DataFrame"
            )

    names = [c[0] for c in cols]
    src = df.select(*names, *ind_names)
    has_strl = any(c[1] == "strl" for c in cols)
    if has_strl:
        # strL GSO records key on the GLOBAL row number, which only
        # the ordered driver stream knows — keep packing driver-side
        # (reference W2 pattern)
        from polars_readstat_spark.writers import iter_arrow_chunks

        batches = iter_arrow_chunks(src, 65536)
        data, strls, n_rows = _pack_stream(cols, batches, tagged_missing)
    else:
        # fixed-width records with no cross-row state: pack on the
        # executors, concatenate on the driver in partition order.
        # Big exports take the all-cores JVM-tagged protocol (see
        # iter_ordered_packed; same ≥100k-row policy as por/sav/xpt).
        from polars_readstat_spark.writers import (
            iter_packed_chunks,
            iter_packed_chunks_wide,
        )

        cols_l, tm = list(cols), dict(tagged_missing)
        rec_dtype = _rec_dtype(cols_l)

        def pack_fn(pdf):
            tag_offsets = None
            if tm:
                tag_offsets = {
                    vcol: _parse_tag_offsets(pdf[icol].tolist())
                    for vcol, icol in tm.items()
                }
                for offs in tag_offsets.values():
                    if (offs == 27).any():
                        raise ValueError(
                            "tagged_missing: Stata has no '._' tag "
                            "(only '.' and '.a'-'.z')"
                        )
            return _pack_batch(
                cols_l, rec_dtype, pdf, 0, bytearray(), tag_offsets
            )

        data = bytearray()
        strls = bytearray()
        n_rows = 0
        # dta's pack is a vectorized numpy recarray fill (~2 s per
        # million rows single-core) — cheap enough that the wide
        # protocol's shuffle+persist costs MORE than it saves at the
        # 100k scale where the ladder-style packers (por/sav/xpt)
        # already win; measured 2.0 -> 3.2 s at 600k rows. Only very
        # large exports take the wide path.
        chunks_iter = (
            iter_packed_chunks_wide if int(stats["__n"]) >= 2_000_000
            else iter_packed_chunks
        )
        for payload, n in chunks_iter(
            src, pack_fn, 65536,
            modules=(
                "polars_readstat_spark.writers.dta",
                "polars_readstat_spark.writers.tagged",
            ),
        ):
            data += payload
            n_rows += n
    out = _assemble_dta(
        cols, data, strls, n_rows, data_label, variable_labels, value_labels
    )
    from polars_readstat_spark.sources.fs import fs_open_output

    with fs_open_output(path) as f:
        f.write(out)

