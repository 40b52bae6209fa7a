"""Vectorized SAS row decode: contiguous row records → pyarrow arrays.

Numerics are IEEE doubles possibly truncated to 3-7 bytes (the stored
bytes are the most-significant ones); decode reconstitutes the 8-byte
pattern with numpy slice assignment — no per-row Python (reference
src/sas/value.rs:58-91, vectorized). Non-finite patterns → null
(reference src/sas/value.rs:123 treats >= 0x7ff0... as missing).
Dates: SAS epoch 1960-01-01; days → date32, seconds → timestamp(µs),
time seconds → ns-since-midnight int64 (Spark has no TimeType —
documented mapping choice, SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from polars_readstat_spark.sources import strdecode
from polars_readstat_spark.sources.sas7bdat.meta import SasColumn, SasMeta

SAS_EPOCH_DAYS = -3653  # 1960-01-01 relative to Unix epoch
SAS_EPOCH_US = SAS_EPOCH_DAYS * 86400 * 1_000_000


class _NumericFast:
    """Per-batch aligned reinterpretations of the row matrix for the
    numeric decode (round 13: the one read headline above the
    reference was the ACS wide scan, whose 280 numeric columns each
    paid a per-row 2D byte-slice copy). Width-8 columns at 8-aligned
    offsets become ONE strided float64 column copy; width-4 truncated
    doubles at 4-aligned offsets (the ACS shape — SAS stores the
    HIGH-order half) become one strided uint32 gather + a shift into
    the f8 bit pattern. When the row length isn't 8-aligned, one
    bulk row-padded copy (row-wise memcpy, ~ms) buys the aligned
    views — only taken when enough columns benefit."""

    MIN_COLS = 4  # fewer eligible columns than this: skip the pad

    def __init__(self, rows: np.ndarray, rl: int, little: bool, cols):
        self.f8 = None
        self.u32 = None
        if not little or not rows.flags.c_contiguous:
            return
        eligible = sum(
            1
            for c in cols
            if c.ctype != "s"
            and (
                (c.width == 8 and c.offset % 8 == 0)
                or (c.width == 4 and c.offset % 4 == 0)
            )
        )
        if eligible == 0:
            return
        if rl % 8 == 0:
            m = rows  # zero-copy views
        elif eligible >= self.MIN_COLS:
            rlp = ((rl + 7) // 8) * 8
            m = np.zeros((rows.shape[0], rlp), dtype=np.uint8)
            m[:, :rl] = rows
        else:
            return
        self.f8 = m.view("<f8")
        self.u32 = m.view("<u4")

    def column(self, col: SasColumn) -> np.ndarray | None:
        off, w = col.offset, col.width
        if self.f8 is not None and w == 8 and off % 8 == 0:
            return np.ascontiguousarray(self.f8[:, off // 8])
        if self.u32 is not None and w == 4 and off % 4 == 0:
            u = np.ascontiguousarray(self.u32[:, off // 4]).astype(
                "<u8"
            )
            return (u << np.uint64(32)).view("<f8")
        return None


def decode_numeric_raw(
    rows: np.ndarray,
    col: SasColumn,
    little: bool,
    fast: _NumericFast | None = None,
) -> np.ndarray:
    """(n, row_length) uint8 matrix → float64 values for one column.
    ``fast`` (see _NumericFast) short-circuits the aligned shapes."""
    w = col.width
    if fast is not None:
        v = fast.column(col)
        if v is not None:
            return v
    sl = rows[:, col.offset : col.offset + w]
    if w == 8:
        vals = np.ascontiguousarray(sl).view("<f8" if little else ">f8").ravel()
        return vals if little else vals.astype("<f8")
    n = rows.shape[0]
    full = np.zeros((n, 8), dtype=np.uint8)
    if little:
        # stored bytes are the high-order end (last positions in LE)
        full[:, 8 - w :] = sl
        return full.view("<f8").ravel()
    full[:, :w] = sl
    return full.view(">f8").ravel().astype("<f8")


def numeric_missing_tags(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized tagged-missing classification of decoded doubles.

    SAS stores `.A`-`.Z` / `._` as NaNs whose payload byte at bits
    [47:40] is the ones-complement of the tag (reference
    decode_numeric_bytes_mask_tagged + sas_tag_to_offset,
    src/sas/value.rs:142-194; real-SAS fixture `.X` = 0xffffe6…,
    complement 0x19 = 25 under the alternate 2..27 scheme).

    Returns (mask, offsets): mask True where the pattern is any
    non-finite (missing), offsets uint8 with 1-26 = `.A`-`.Z`,
    27 = `._`, 0 = plain system missing `.` (or a valid value).
    """
    bits = vals.view(np.uint64)
    mask = (bits & np.uint64(0x7FFF_FFFF_FFFF_FFFF)) >= np.uint64(
        0x7FF0_0000_0000_0000
    )
    decoded = (~(bits >> np.uint64(40)).astype(np.uint8))
    offsets = np.zeros(len(vals), dtype=np.uint8)
    offsets[(decoded == 0) | (decoded == 0x5F)] = 27  # 0 / '_'
    alt = (decoded >= 2) & (decoded <= 27)  # ReadStat alternate scheme
    offsets[alt] = decoded[alt] - 1
    upper = (decoded >= 0x41) & (decoded <= 0x5A)  # literal 'A'-'Z'
    offsets[upper] = decoded[upper] - 0x40
    offsets[~mask] = 0
    return mask, offsets


def sas_indicator(mask: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Indicator strings '.A'-'.Z' / '._' (reference
    sas_offset_to_label, src/sas/value.rs:197-204); null where the
    value is present AND for plain system missing — in the SAS family
    `.` carries no information beyond the null itself (reference
    src/lib.rs:113 'System missing (`.`) always becomes a plain
    null'), unlike Stata where '.' is emitted."""
    out: list[str | None] = [None] * len(mask)
    for i in np.flatnonzero(mask & (offsets != 0)):
        o = int(offsets[i])
        if o == 27:
            out[i] = "._"
        else:
            out[i] = "." + chr(ord("A") + o - 1)
    return pa.array(out, type=pa.string())


def finish_numeric(vals: np.ndarray, mask: np.ndarray, col: SasColumn) -> pa.Array:
    """Decoded doubles + missing mask → typed arrow array by the
    column's display-format class (date/datetime/time promotions)."""
    tk = col.time_kind
    if tk == "date":
        days = np.round(np.where(mask, 0, vals)).astype(np.int64) + SAS_EPOCH_DAYS
        return strdecode.pa_masked(days.astype(np.int32), pa.date32(), mask)
    if tk == "datetime":
        us = np.round(np.where(mask, 0, vals) * 1e6).astype(np.int64) + SAS_EPOCH_US
        return strdecode.pa_masked(us, pa.timestamp("us"), mask)
    if tk == "time":
        ns = np.round(np.where(mask, 0, vals) * 1e9).astype(np.int64)
        return strdecode.pa_masked(ns, pa.int64(), mask)
    return strdecode.pa_masked(vals, pa.float64(), mask)


def decode_column(
    rows: np.ndarray,
    col: SasColumn,
    meta: SasMeta,
    missing_string_as_null: bool,
    fast: _NumericFast | None = None,
) -> pa.Array:
    if col.ctype == "s":
        m = np.ascontiguousarray(rows[:, col.offset : col.offset + col.width])
        arr = strdecode.try_vectorized(
            m, strdecode.lengths_rstrip(m, strip=(0, 0x20)), meta.encoding
        )
        if arr is not None:
            if missing_string_as_null:
                arr = strdecode.empty_to_null(arr)
            return arr
        # slow path: non-ASCII bytes under a non-UTF8 codepage
        b = m.tobytes()
        w = col.width
        enc = meta.encoding
        out = []
        for i in range(rows.shape[0]):
            s = b[i * w : (i + 1) * w].rstrip(b"\x00 ")
            try:
                out.append(s.decode(enc))
            except (UnicodeDecodeError, LookupError):
                out.append(s.decode("latin-1", errors="replace"))
        if missing_string_as_null:
            out = [s if s != "" else None for s in out]
        return pa.array(out, type=pa.string())

    vals = decode_numeric_raw(rows, col, meta.little_endian, fast)
    return finish_numeric(vals, ~np.isfinite(vals), col)


def decode_rows(
    meta: SasMeta,
    buf: bytes,
    col_indices: list[int],
    missing_string_as_null: bool,
    informative: dict | None = None,
) -> pa.RecordBatch:
    from polars_readstat_spark.sources import informative as inf

    rl = max(meta.row_length, 1)
    n = len(buf) // rl
    rows = np.frombuffer(buf, dtype=np.uint8, count=n * rl).reshape(n, rl)
    # one per-batch aligned reinterpretation for the numeric fast
    # paths (frombuffer+reshape is C-contiguous)
    fast = _NumericFast(
        rows, rl, meta.little_endian, [meta.columns[i] for i in col_indices]
    )
    arrays = []
    names = []
    for i in col_indices:
        c = meta.columns[i]
        if (
            informative
            and c.ctype != "s"
            and inf.eligible(informative, c.name)
        ):
            vals = decode_numeric_raw(rows, c, meta.little_endian, fast)
            mask, offsets = numeric_missing_tags(vals)
            col_arr = finish_numeric(vals, mask, c)
            ind = sas_indicator(mask, offsets)
            for nm, arr in inf.assemble(
                informative["mode"], c.name, informative["suffix"], col_arr, ind
            ):
                arrays.append(arr)
                names.append(nm)
            continue
        arrays.append(
            decode_column(rows, c, meta, missing_string_as_null, fast)
        )
        names.append(c.name)
    return pa.RecordBatch.from_arrays(arrays, names=names)
