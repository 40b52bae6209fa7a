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


def decode_numeric_raw(rows: np.ndarray, col: SasColumn, little: bool) -> np.ndarray:
    """(n, row_length) uint8 matrix → float64 values for one column."""
    w = col.width
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


def decode_column(
    rows: np.ndarray,
    col: SasColumn,
    meta: SasMeta,
    missing_string_as_null: bool,
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

    vals = decode_numeric_raw(rows, col, meta.little_endian)
    mask = ~np.isfinite(vals)
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


def decode_rows(
    meta: SasMeta,
    buf: bytes,
    col_indices: list[int],
    missing_string_as_null: bool,
) -> pa.RecordBatch:
    rl = max(meta.row_length, 1)
    n = len(buf) // rl
    rows = np.frombuffer(buf, dtype=np.uint8, count=n * rl).reshape(n, rl)
    arrays = []
    names = []
    for i in col_indices:
        c = meta.columns[i]
        arrays.append(decode_column(rows, c, meta, missing_string_as_null))
        names.append(c.name)
    return pa.RecordBatch.from_arrays(arrays, names=names)
