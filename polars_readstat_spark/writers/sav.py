"""SPSS .sav writer — reference W3 re-expressed for Spark.

Same two-phase shape as the Stata writer (and the reference's
sink pre-pass, pybindings.rs:996-1047):

1. **Pre-pass job**: per-string-column max UTF-8 byte width + row
   count (one Spark aggregation).
2. **Stream**: Arrow chunks in partition order; each batch is
   packed into the fixed-width 8-byte-element case layout with numpy
   (vectorized; no per-value Python in the numeric path).

Output defaults to an *uncompressed* system file (compression=0):
every case is case_size×8 bytes, so the file we write is itself
partitionable by our own reader — the right trade at cluster scale
where re-read parallelism matters more than bytes on disk.
``compress=True`` opts into SPSS's bytecode compression (the
compression=1 stream real SPSS emits by default): integral values in
[1-bias, 251-bias] become one-byte bias commands, system missing →
255, all-spaces string elements → 254, everything else a literal —
typically 5-8× smaller for integer-coded survey data, at the cost of
a serial re-read (the bias stream has no affine byte↔element map).

Layout per the public PSPP system-file spec (same records the reader
parses): header, type-2 variable records (+ continuations), 3/4 value
labels, type-7 subtypes 3 (integer info), 4 (float info), 13 (long
names), 20 (encoding=UTF-8), then 999.

Reference parity: spss/writer.rs (≤255-byte strings enforced, auto
8-char short names, value/variable labels, measure/format carry-through).
"""

from __future__ import annotations

import datetime
import struct

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_readstat_spark.writers import str_cell_matrix, ts_epoch_seconds

SYSMIS_BITS = 0xFFEFFFFFFFFFFFFF
SPSS_SEC_SHIFT = 12_219_379_200


def _short_names(names: list[str]) -> list[bytes]:
    """Unique uppercase ≤8-byte short names (reference spss/writer.rs
    auto short-name behavior)."""
    out: list[bytes] = []
    seen: set[bytes] = set()
    for i, n in enumerate(names):
        base = "".join(
            c for c in n.upper() if c.isalnum() or c in "@#$_."
        ) or f"VAR{i + 1}"
        if base[0].isdigit():
            base = "V" + base
        cand = base[:8].encode("utf-8", "ignore")[:8] or f"VAR{i + 1}".encode()
        k = 1
        while cand in seen:
            suffix = str(k).encode()
            cand = cand[: 8 - len(suffix)] + suffix
            k += 1
        seen.add(cand)
        out.append(cand)
    return out


def _fmt_int(fmt_type: int, width: int, dec: int) -> int:
    return (fmt_type << 16) | (width << 8) | dec


def _sav_columns(df: DataFrame):
    """→ (fields, names, shorts, kinds, pre-pass aggs).
    kind: num | date | datetime | time | str."""
    fields = df.schema.fields
    names = [f.name for f in fields]
    shorts = _short_names(names)
    kinds = []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        t = f.dataType.simpleString()
        if t == "string":
            kinds.append("str")
            aggs.append(
                F.max(F.octet_length(f.name)).alias(f"__w_{f.name}")
            )
        elif t == "date":
            kinds.append("date")
        elif t.startswith("timestamp"):
            kinds.append("datetime")
        elif t == "bigint" and f.metadata.get("time") == "ns_since_midnight":
            kinds.append("time")
        elif t in ("tinyint", "smallint", "int", "bigint", "float",
                   "double", "boolean", "decimal", "short", "long") or t.startswith("decimal"):
            kinds.append("num")
        else:
            raise ValueError(f"write_sav: unsupported type {t} for {f.name}")
    return fields, names, shorts, kinds, aggs


def _sav_widths(fields, kinds, stats) -> list[int]:
    """String byte widths from pre-pass stats (0 for numeric)."""
    widths = []
    for f, k in zip(fields, kinds):
        if k == "str":
            w = stats.get(f"__w_{f.name}") or 1
            w = max(int(w), 1)
            if w > 255:
                raise ValueError(
                    f"write_sav: column {f.name} has strings wider than "
                    "255 bytes (SPSS limit; reference writer.rs rejects too)"
                )
            widths.append(w)
        else:
            widths.append(0)
    return widths


def write_sav(
    df: DataFrame,
    path: str,
    data_label: str = "",
    variable_labels: dict | None = None,
    value_labels: dict | None = None,
    measures: dict | None = None,
    zsav: bool | None = None,
    compress: bool = False,
) -> None:
    """zsav=True (or a .zsav path) emits the ZLIB-container variant:
    same dictionary under a $FL3 magic, case data written as
    independently-decompressible zlib blocks with the offset trailer
    (the public PSPP "ZLIB data block" layout our reader partitions
    on). The inner stream uses bytecode compression's literal escape
    (253×8 command blocks) so the writer stays single-pass.

    compress=True (non-zsav) emits SPSS bytecode compression
    (compression=1, the stream real SPSS writes by default): integral
    values in [1-bias, 251-bias] become one-byte bias commands,
    system missing → 255, all-spaces string elements → 254, the rest
    literals. 5-8× smaller for integer-coded data; re-reads are
    serial (a bias stream has no affine byte↔element map), so the
    uncompressed default remains the cluster-scale choice."""
    variable_labels = variable_labels or {}
    value_labels = value_labels or {}
    measures = measures or {}
    if zsav is None:
        zsav = path.lower().endswith(".zsav")
    if zsav:
        compress = False  # zsav's zlib layer subsumes it; stream
        # stays all-literal so our reader's parallel plan applies

    fields, names, shorts, kinds, aggs = _sav_columns(df)
    stats = df.agg(*aggs).collect()[0].asDict()
    nrows = stats["__n"]
    widths = _sav_widths(fields, kinds, stats)

    el_per = [max((w + 7) // 8, 1) if w else 1 for w in widths]
    case_size = sum(el_per)

    out = _sav_dictionary(
        fields, names, shorts, kinds, widths, el_per, case_size, nrows,
        zsav, data_label, variable_labels, value_labels, measures,
        compress=compress,
    )

    # ---- data: stream partitions, pack vectorized --------------------
    src = _sav_cast(df, fields, kinds)

    el_numeric = np.concatenate(
        [
            np.zeros(ne, dtype=bool) if k == "str" else np.ones(1, dtype=bool)
            for k, ne in zip(kinds, el_per)
        ]
    ) if case_size else np.zeros(0, dtype=bool)

    from polars_readstat_spark.sources.fs import fs_open_output

    with fs_open_output(path) as fh:
        fh.write(bytes(out))
        if zsav:
            sink = _ZlibSink(fh, len(out))
        elif compress:
            sink = _BytecodeSink(fh, el_numeric)
        else:
            sink = fh
        # case packing runs on the executors; the driver concatenates
        # (and, for zsav, zlib-frames) in partition order. Big
        # exports take the all-cores JVM-tagged protocol — the narrow
        # path's toLocalIterator runs ~1 input partition at a time,
        # capping pack parallelism at the scan's partition count
        # (guide §2.6 idle capacity; same policy as the por writer).
        from polars_readstat_spark.writers import (
            iter_ordered_packed,
            iter_packed_chunks,
        )

        kinds_l, widths_l, el_l, cs = (
            list(kinds), list(widths), list(el_per), case_size
        )

        def pack_fn(pdf):
            return _pack_columns(
                [pdf.iloc[:, i] for i in range(pdf.shape[1])],
                kinds_l, widths_l, el_l, cs,
            )

        sav_mods = (
            "polars_readstat_spark.writers.sav",
            "polars_readstat_spark.writers",
        )
        # wide protocol: cast AFTER the repartition (guide §2.3 —
        # project before the exchange). RangePartitioner's bounds
        # sampling re-executes the exchange child once; with the cast
        # post-shuffle that extra pass is the bare scan + order tags,
        # not scan + date/double casts (measured: the pre-cast child
        # cost the sav export ~0.4 s/run at sf0.1, r14)
        chunks = (
            iter_ordered_packed(
                df, pack_fn, 8192, modules=sav_mods,
                cast=lambda b: _sav_cast(
                    b, fields, kinds,
                    extra=[F.col("__prs_mid"), F.col("__prs_cid")],
                ),
            )
            if int(nrows) >= 100_000
            else iter_packed_chunks(src, pack_fn, 8192, modules=sav_mods)
        )
        try:
            for payload, _n in chunks:
                sink.write(payload)
            if zsav or compress:
                sink.close()
        except BaseException:
            # a failing Spark stage mid-stream must not leak the zsav
            # compression pool (or its in-flight blocks) for the
            # lifetime of the process — the file is dead either way
            if zsav:
                sink.abort()
            raise


def _sav_dictionary(
    fields, names, shorts, kinds, widths, el_per, case_size, nrows,
    zsav, data_label, variable_labels, value_labels, measures,
    compress: bool = False,
) -> bytearray:
    """System-file dictionary: header, type-2 records, 3/4 value
    labels, type-7 subtypes, 999 terminator."""
    out = bytearray()
    prod = ("@(#) SPSS DATA FILE - polars_readstat_spark").ljust(60)[:60]
    now = datetime.datetime.now()
    out += (b"$FL3" if zsav else b"$FL2") + prod.encode()
    out += struct.pack(
        "<5i", 2, case_size,
        2 if zsav else (1 if compress else 0), 0, int(nrows),
    )
    out += struct.pack("<d", 100.0)
    out += now.strftime("%d %b %y").ljust(9)[:9].encode()
    out += now.strftime("%H:%M:%S").ljust(8)[:8].encode()
    out += data_label.encode("utf-8")[:64].ljust(64)
    out += b"\x00\x00\x00"
    assert len(out) == 176

    el_index = []  # 1-based first element index per variable
    pos = 1
    for i, f in enumerate(fields):
        el_index.append(pos)
        k = kinds[i]
        w = widths[i]
        vtype = w if k == "str" else 0
        if k == "str":
            pf = _fmt_int(1, min(w, 255), 0)  # A
        elif k == "date":
            pf = _fmt_int(38, 10, 0)  # EDATE10
        elif k == "datetime":
            pf = _fmt_int(22, 20, 0)  # DATETIME20
        elif k == "time":
            pf = _fmt_int(21, 8, 0)  # TIME8
        else:
            pf = _fmt_int(5, 8, 2)  # F8.2
        label = variable_labels.get(f.name) or f.metadata.get("label") or ""
        lab_b = label.encode("utf-8")[:255] if label else b""
        out += struct.pack("<6i", 2, vtype, 1 if lab_b else 0, 0, pf, pf)
        out += shorts[i].ljust(8)
        if lab_b:
            out += struct.pack("<i", len(lab_b))
            out += lab_b.ljust((len(lab_b) + 3) // 4 * 4, b" ")
        for _ in range(el_per[i] - 1):
            out += struct.pack("<6i", 2, -1, 0, 0, 0, 0) + b" " * 8
        pos += el_per[i]

    # value labels (numeric columns only in record 3/4)
    for i, f in enumerate(fields):
        vl = value_labels.get(f.name)
        if not vl or kinds[i] == "str":
            continue
        out += struct.pack("<2i", 3, len(vl))
        for val, lab in vl.items():
            out += struct.pack("<d", float(val))
            lb = str(lab).encode("utf-8")[:255]
            # label byte + label, padded so (1+len) is a multiple of 8
            padded = (len(lb) + 1 + 7) // 8 * 8 - 1
            out += bytes([len(lb)]) + lb.ljust(padded)
        out += struct.pack("<3i", 4, 1, el_index[i])

    # subtype 3: integer info (machine/version; codepage 65001 = UTF-8)
    out += struct.pack("<3i", 7, 3, 4) + struct.pack("<i", 8)
    out += struct.pack("<8i", 1, 0, 0, 1, 1, 1, 2, 65001)
    # subtype 4: float info (sysmis, highest, lowest)
    out += struct.pack("<3i", 7, 4, 8) + struct.pack("<i", 3)
    sysmis = struct.unpack("<d", struct.pack("<Q", SYSMIS_BITS))[0]
    highest = struct.unpack("<d", struct.pack("<Q", 0x7FEFFFFFFFFFFFFF))[0]
    out += struct.pack("<3d", sysmis, highest, sysmis)
    # subtype 11: display parameters (measure, width, alignment)
    disp = []
    for i, f in enumerate(fields):
        m = measures.get(f.name) or f.metadata.get("measure") or ""
        mcode = {"nominal": 1, "ordinal": 2, "scale": 3}.get(m, 1 if kinds[i] == "str" else 3)
        disp += [mcode, max(widths[i], 8), 0 if kinds[i] == "str" else 1]
    out += struct.pack("<3i", 7, 11, 4) + struct.pack("<i", len(disp))
    out += struct.pack(f"<{len(disp)}i", *disp)
    # subtype 13: long variable names
    pairs = b"\t".join(
        shorts[i] + b"=" + names[i].encode("utf-8") for i in range(len(names))
    )
    out += struct.pack("<3i", 7, 13, 1) + struct.pack("<i", len(pairs)) + pairs
    # subtype 20: encoding
    enc = b"UTF-8"
    out += struct.pack("<3i", 7, 20, 1) + struct.pack("<i", len(enc)) + enc
    # dictionary terminator
    out += struct.pack("<2i", 999, 0)
    return out


def _sav_cast(df: DataFrame, fields, kinds, extra=()) -> DataFrame:
    """Select casts once so every batch arrives pre-converted (dates →
    seconds since 1582, etc.). ``extra`` appends pass-through columns
    (the wide protocol's __prs_mid/__prs_cid order tags)."""
    sel = []
    for i, f in enumerate(fields):
        c = F.col(f.name)
        k = kinds[i]
        if k == "num":
            sel.append(c.cast("double").alias(f.name))
        elif k == "date":
            # days since 1970 → seconds since 1582
            sel.append(
                (F.unix_date(c).cast("double") * 86400.0 + float(SPSS_SEC_SHIFT))
                .alias(f.name)
            )
        elif k == "datetime":
            sel.append(
                (ts_epoch_seconds(c) + float(SPSS_SEC_SHIFT)).alias(f.name)
            )
        elif k == "time":
            sel.append((c.cast("double") / 1e9).alias(f.name))
        else:
            sel.append(c.alias(f.name))
    return df.select(*sel, *extra)


_SYSMIS_LE = np.frombuffer(struct.pack("<Q", SYSMIS_BITS), dtype=np.uint8)


def _pack_columns(cols_data, kinds, widths, el_per, case_size) -> bytes:
    """Column-wise vectorized case packing. cols_data: one sequence
    per column (tuples from toLocalIterator rows, or pandas Series
    from the distributed mapInPandas path)."""
    n = len(cols_data[0]) if cols_data else 0
    mat = np.zeros((n, case_size * 8), dtype=np.uint8)
    colpos = 0
    for col, k, w, ne in zip(cols_data, kinds, widths, el_per):
        off = colpos * 8
        if k == "str":
            mat[:, off : off + ne * 8] = str_cell_matrix(col, ne * 8)
        else:
            try:  # pandas Series: nullable-aware bulk conversion
                vals = col.to_numpy(dtype="float64", na_value=np.nan)
            except AttributeError:
                vals = np.array(
                    [np.nan if v is None else v for v in col], dtype=np.float64
                )
            bts = vals.astype("<f8").view(np.uint8).reshape(n, 8)
            miss = np.isnan(vals)
            if miss.any():
                bts = bts.copy()
                bts[miss] = _SYSMIS_LE
            mat[:, off : off + 8] = bts
        colpos += ne
    return mat.tobytes()


class _BytecodeSink:
    """compression=1 data sink: buffers raw 8-byte case elements and
    encodes whole 8-element command groups vectorized — bias command
    for integral numerics in [1-bias, 251-bias], 255 for system
    missing, 254 for all-spaces string elements, 253 + payload for
    everything else. Kind-aware via the per-case element-numeric
    mask tiled over the stream (a string element whose bytes
    coincide with the sysmis pattern must stay literal)."""

    def __init__(self, fh, el_numeric: np.ndarray, bias: float = 100.0):
        self.fh = fh
        self.el_numeric = np.asarray(el_numeric, dtype=bool)
        self.bias = float(bias)
        self.pending = b""
        self.el_pos = 0  # global element counter → kind phase

    def write(self, raw: bytes):
        data = self.pending + raw if self.pending else raw
        full = (len(data) // 64) * 64  # whole 8-element groups
        if full:
            self._encode(data[:full])
        self.pending = data[full:]

    def _encode(self, chunk: bytes):
        els = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 8)
        n = els.shape[0]
        cs = max(self.el_numeric.size, 1)
        idx = (self.el_pos + np.arange(n, dtype=np.int64)) % cs
        num = (
            self.el_numeric[idx]
            if self.el_numeric.size
            else np.ones(n, dtype=bool)
        )
        self.el_pos += n
        u = els.view("<u8").reshape(-1)
        vals = els.view("<f8").reshape(-1)
        codes = np.full(n, 253, dtype=np.uint8)
        sysm = num & (u == np.uint64(SYSMIS_BITS))
        with np.errstate(invalid="ignore"):
            iv = np.floor(vals)
            biasable = (
                num
                & ~sysm
                & np.isfinite(vals)
                & (vals == iv)
                & (iv >= 1 - self.bias)
                & (iv <= 251 - self.bias)
            )
        codes[sysm] = 255
        codes[biasable] = (iv[biasable] + self.bias).astype(np.uint8)
        spaces = ~num & (u == np.uint64(0x2020202020202020))
        codes[spaces] = 254
        ng = (n + 7) // 8
        cpad = np.zeros(ng * 8, dtype=np.uint8)
        cpad[:n] = codes
        lit = cpad == 253
        lit_per = lit.reshape(ng, 8).sum(axis=1).astype(np.int64)
        out = np.empty(ng * 8 + int(lit_per.sum()) * 8, dtype=np.uint8)
        goff = np.zeros(ng, dtype=np.int64)
        np.cumsum(8 + lit_per[:-1] * 8, out=goff[1:])
        cols8 = np.arange(8, dtype=np.int64)
        out[goff[:, None] + cols8] = cpad.reshape(ng, 8)
        lit_idx = np.flatnonzero(lit[:n])
        if lit_idx.size:
            lit_grp = lit_idx >> 3
            starts = np.zeros(ng, dtype=np.int64)
            np.cumsum(lit_per[:-1], out=starts[1:])
            within = (
                np.arange(lit_idx.size, dtype=np.int64) - starts[lit_grp]
            )
            dest = goff[lit_grp] + 8 + within * 8
            out[dest[:, None] + cols8] = els[lit_idx]
        self.fh.write(out.tobytes())

    def close(self):
        if self.pending:
            tail = self.pending[: (len(self.pending) // 8) * 8]
            if tail:
                self._encode(tail)
            self.pending = b""
        self.fh.write(bytes([252] + [0] * 7))


class _ZlibSink:
    """ZSAV data sink: wraps 8-byte case elements in bytecode literal
    framing (253×8 command blocks), chunks the stream into
    independently-compressed zlib blocks, and writes the zheader +
    offset trailer (public PSPP ZLIB data block layout — the same
    structure the reader's block index parses)."""

    BLOCK = 0x3FF000

    def __init__(self, fh, zheader_ofs: int):
        import struct as _s
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        self.fh = fh
        self.zheader_ofs = zheader_ofs
        self.pending = b""  # raw elements not yet framed
        self.stream = bytearray()  # framed bytecode awaiting a block
        self.blocks = []  # (unc_ofs, c_ofs, unc_size, c_size)
        self.unc_pos = zheader_ofs  # PSPP: offsets count from zheader
        # blocks compress independently and zlib releases the GIL, so
        # a small pool pipelines the compression while this thread
        # keeps framing; blocks are still WRITTEN strictly in order
        # (deque drain), so the file is byte-identical to the serial
        # path. In-flight depth is capped to bound memory at ~8 blocks.
        self._pool = ThreadPoolExecutor(4)
        self._inflight = deque()  # (future, unc_ofs, unc_size)
        # placeholder zheader, backpatched in close()
        fh.write(_s.pack("<3q", zheader_ofs, 0, 0))

    def _frame(self, final: bool = False):
        import numpy as np

        data = self.pending
        full = len(data) // 64
        if full:
            elems = np.frombuffer(data, dtype=np.uint8, count=full * 64)
            grp = np.empty((full, 72), dtype=np.uint8)
            grp[:, :8] = 253
            grp[:, 8:] = elems.reshape(full, 64)
            self.stream += grp.tobytes()
            self.pending = data[full * 64 :]
        if final and self.pending:
            k = len(self.pending) // 8
            cmd = bytes([253] * k + [0] * (8 - k))
            self.stream += cmd + self.pending
            self.pending = b""
        if final:
            self.stream += bytes([252] + [0] * 7)

    def _drain(self, limit: int):
        while self._inflight and (
            len(self._inflight) > limit or self._inflight[0][0].done()
        ):
            fut, unc_ofs, unc_sz = self._inflight.popleft()
            comp = fut.result()
            self.blocks.append((unc_ofs, self.fh.tell(), unc_sz, len(comp)))
            self.fh.write(comp)

    def _flush_blocks(self, final: bool = False):
        import zlib

        while len(self.stream) >= self.BLOCK or (final and self.stream):
            chunk = bytes(self.stream[: self.BLOCK])
            del self.stream[: self.BLOCK]
            self._inflight.append(
                (
                    self._pool.submit(zlib.compress, chunk, 6),
                    self.unc_pos,
                    len(chunk),
                )
            )
            self.unc_pos += len(chunk)
            self._drain(8)
        if final:
            self._drain(0)

    def write(self, raw: bytes):
        self.pending += raw
        self._frame()
        self._flush_blocks()

    def abort(self):
        """Error-path cleanup: release the pool and any in-flight
        compressed blocks without touching the (now invalid) file."""
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._inflight.clear()
        self.stream = bytearray()
        self.pending = b""

    def close(self):
        import struct as _s

        self._frame(final=True)
        self._flush_blocks(final=True)
        self._pool.shutdown()
        trailer_ofs = self.fh.tell()
        self.fh.write(_s.pack("<qqii", -100, 0, self.BLOCK, len(self.blocks)))
        for unc_ofs, c_ofs, unc_sz, c_sz in self.blocks:
            self.fh.write(_s.pack("<qqii", unc_ofs, c_ofs, unc_sz, c_sz))
        end = self.fh.tell()
        self.fh.seek(self.zheader_ofs)
        self.fh.write(
            _s.pack("<3q", self.zheader_ofs, trailer_ofs, end - trailer_ofs)
        )
        self.fh.seek(end)
