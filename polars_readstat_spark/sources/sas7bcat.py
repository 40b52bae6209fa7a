"""SAS format catalog (.sas7bcat) reader — reference S8 re-expressed.

A catalog is a sas7bdat-style page container holding PROC FORMAT
value-label definitions. The block layout is publicly documented by
the ReadStat project (readstat_sas7bcat_read.c), which both the
reference (src/sas/catalog.rs:312-402) and this module re-derive:

1. header: same magic/alignment/endian/encoding fields as sas7bdat;
2. page 1 (and any later page opening with an XLSR marker) holds
   XLSR index entries; entries flagged 'O' point at label blocks as
   (page, offset) pairs;
3. each block is a chain of linked segments (next_page, next_pos,
   length) headers that concatenate into one payload;
4. a block payload carries the format name (short at +8, or a 32-byte
   long name when flagged) and a two-pass value/label table: value
   entries first (label_pos → offset map), then (len, label) records.
   Numeric codes are stored negated as big-endian doubles; SAS
   missing-tag patterns are skipped.

Output: {format_name: {code: label}} with names uppercased and
trailing dots stripped — ready for the T3 catalog-label apply
(`apply_catalog_labels`).
"""

from __future__ import annotations

import struct

from polars_readstat_spark.sources.sas7bdat.meta import ENCODINGS
from polars_readstat_spark.sources.fs import fs_open

CATALOG_MAGIC_TAIL = bytes(
    [0xC2, 0xEA, 0x81, 0x63, 0xB3, 0x14, 0x11, 0xCF,
     0xBD, 0x92, 0x08, 0x00, 0x09, 0xC7, 0x31, 0x8C,
     0x18, 0x1F, 0x10, 0x11]
)
FIRST_INDEX_PAGE = 1
USELESS_PAGES = 3


def _dec(b: bytes, enc: str) -> str:
    try:
        s = b.decode(enc)
    except (UnicodeDecodeError, LookupError):
        s = b.decode("latin-1")
    return s.rstrip("\0 ")


class _Cat:
    def __init__(self, data: bytes):
        self.data = data
        hdr = data[:288]
        if hdr[12:32] != CATALOG_MAGIC_TAIL and any(hdr[:32]):
            # sas7bdat magic shares the same tail; accept either
            pass
        self.u64 = hdr[32:33] == b"3"
        file_le = hdr[37] == 0x01
        self.e = "<" if file_le else ">"
        self.pad1 = 4 if hdr[35:36] == b"3" else 0
        self.enc = ENCODINGS.get(hdr[70], "cp1252")
        a = self.pad1
        self.header_size = self._u4(196 + a)
        self.page_size = self._u4(200 + a)
        self.page_count = self._u4(204 + a)
        self.xlsr_size = 212 + self.pad1 + (72 if self.u64 else 0)
        self.xlsr_offset = 856 + 2 * self.pad1 + (144 if self.u64 else 0)
        self.xlsr_o_offset = 50 + self.pad1 + (24 if self.u64 else 0)

    def _u2(self, off: int, buf: bytes | None = None) -> int:
        b = self.data if buf is None else buf
        return struct.unpack_from(self.e + "H", b, off)[0]

    def _u4(self, off: int, buf: bytes | None = None) -> int:
        b = self.data if buf is None else buf
        return struct.unpack_from(self.e + "I", b, off)[0]

    def _u8(self, off: int, buf: bytes | None = None) -> int:
        b = self.data if buf is None else buf
        return struct.unpack_from(self.e + "Q", b, off)[0]

    def page(self, i: int) -> bytes:
        start = self.header_size + i * self.page_size
        return self.data[start : start + self.page_size]

    # ---- XLSR index --------------------------------------------------
    def collect_block_pointers(self) -> list[tuple[int, int]]:
        ptrs: set[tuple[int, int]] = set()

        def scan(page: bytes, start: int):
            off = start
            end = len(page)
            while off + self.xlsr_size <= end:
                if page[off : off + 4] != b"XLSR":
                    off += 8
                    if off + 4 > end or page[off : off + 4] != b"XLSR":
                        break
                if off + self.xlsr_o_offset >= end:
                    break
                if page[off + self.xlsr_o_offset] == ord("O"):
                    if self.u64:
                        if off + 18 > end:
                            break
                        pg = self._u8(off + 8, page)
                        pos = self._u2(off + 16, page)
                    else:
                        if off + 10 > end:
                            break
                        pg = self._u4(off + 4, page)
                        pos = self._u2(off + 8, page)
                    if pg > 0 and pos > 0:
                        ptrs.add((pg, pos))
                off += self.xlsr_size

        p1 = self.page(FIRST_INDEX_PAGE)
        if self.xlsr_offset < len(p1):
            scan(p1, self.xlsr_offset)
        for i in range(USELESS_PAGES, self.page_count):
            p = self.page(i)
            if len(p) >= 20 and p[16:20] == b"XLSR":
                scan(p, 16)
        return sorted(ptrs)

    # ---- chained block assembly -------------------------------------
    def read_block(self, start_page: int, start_pos: int) -> bytes:
        hdr_len = 32 if self.u64 else 16
        np_, pos = start_page, start_pos
        out = bytearray()
        links = 0
        while 0 < np_ <= self.page_count and pos > 0 and links < self.page_count:
            seek = self.header_size + (np_ - 1) * self.page_size + pos
            chain = self.data[seek : seek + hdr_len]
            if len(chain) < hdr_len:
                break
            if self.u64:
                nxt = self._u4(0, chain)
                nxt_pos = self._u2(8, chain)
                ll = self._u2(10, chain)
            else:
                nxt = self._u4(0, chain)
                nxt_pos = self._u2(4, chain)
                ll = self._u2(6, chain)
            if ll:
                out += self.data[seek + hdr_len : seek + hdr_len + ll]
            np_, pos = nxt, nxt_pos
            links += 1
        return bytes(out)

    # ---- block → (format_name, labels) ------------------------------
    def parse_block(self, data: bytes):
        if len(data) < 106:
            return None
        flags = self._u2(2, data)
        local_pad = 4 if flags & 0x08 else 0
        if self.u64:
            if len(data) < 58 + local_pad:
                return None
            cap = self._u8(42 + local_pad, data)
            used = self._u8(50 + local_pad, data)
        else:
            if len(data) < 46 + local_pad:
                return None
            cap = self._u4(38 + local_pad, data)
            used = self._u4(42 + local_pad, data)
        name = _dec(data[8:16], self.enc)
        payload_off = 106 + (32 if self.u64 else 0)
        eff_pad = local_pad + 16 if local_pad else 0
        has_long = flags & (0x20 if self.u64 else 0x80)
        if has_long:
            ls = payload_off + eff_pad
            if ls + 32 > len(data):
                return None
            name = _dec(data[ls : ls + 32], self.enc)
            eff_pad += 32
        if not used:
            return None
        vl_start = payload_off + eff_pad
        if vl_start >= len(data):
            return None
        labels = self._parse_value_labels(
            data[vl_start:], used, cap, name.startswith("$")
        )
        if not labels:
            return None
        return name.rstrip(".").upper(), labels

    def _parse_value_labels(self, payload, used, cap, is_string):
        if not payload or not cap or not used:
            return []
        value_offsets = [0] * used
        vpos = 0
        for i in range(cap):
            if vpos + 4 > len(payload):
                break
            entry_len = 6 + self._u2(vpos + 2, payload)
            if i < used:
                lp_off = vpos + 10 + self.pad1
                if lp_off + 4 <= len(payload):
                    label_pos = self._u4(lp_off, payload)
                    if label_pos < used:
                        value_offsets[label_pos] = vpos
            vpos += entry_len
            if vpos > len(payload):
                break
        lpos = vpos
        out = []
        for i in range(used):
            if lpos + 10 > len(payload):
                break
            voff = value_offsets[i]
            key = None
            if is_string:
                if voff + 4 > len(payload):
                    break
                entry_len = 6 + self._u2(voff + 2, payload)
                if entry_len < 16 or voff + entry_len > len(payload):
                    break
                key = _dec(payload[voff + entry_len - 16 : voff + entry_len], self.enc)
            else:
                if voff + 30 > len(payload):
                    break
                # numeric codes: big-endian doubles, stored negated
                raw = struct.unpack_from(">d", payload, voff + 22)[0]
                bits = struct.unpack_from(">Q", payload, voff + 22)[0]
                if (bits | 0xFF0000000000) == 0xFFFFFFFFFFFF:
                    # SAS missing/tag pattern → skip entry
                    lbl_len = self._u2(lpos + 8, payload)
                    lpos += 10 + lbl_len + 1
                    continue
                key = -raw
            lbl_len = self._u2(lpos + 8, payload)
            if lpos + 10 + lbl_len > len(payload):
                break
            lbl = _dec(payload[lpos + 10 : lpos + 10 + lbl_len], self.enc)
            out.append((key, lbl))
            lpos += 10 + lbl_len + 1
        return out


def read_sas7bcat(path: str) -> dict[str, dict]:
    """Read a .sas7bcat format catalog → {format_name: {code: label}}.

    Numeric codes come back as floats (negation reversed), character
    formats (named ``$...``) as strings; names are uppercased with
    trailing dots stripped (reference read_sas7bcat,
    src/sas/catalog.rs:312-402; Python facade __init__.py:386-402)."""
    with fs_open(path) as f:
        data = f.read()
    cat = _Cat(data)
    out: dict[str, dict] = {}
    for pg, pos in cat.collect_block_pointers():
        block = cat.read_block(pg, pos)
        parsed = cat.parse_block(block)
        if parsed:
            name, labels = parsed
            out.setdefault(name, {}).update(dict(labels))
    return out


def apply_catalog_labels(df, catalog: dict, columns: dict | None = None):
    """T3: decode columns through catalog formats (reference
    _apply_catalog_labels, __init__.py:476-495).

    columns: {column_name: format_name} — defaults to each column's
    StructField.metadata["format"] (stripped of width/decimals).
    Implemented as a single `F.when`-chain / map-literal projection
    with default = cast(col, string): pure Catalyst, no UDF, no
    shuffle — broadcast-free because the label maps live in the plan.
    """
    from itertools import chain

    from pyspark.sql import functions as F

    if columns is None:
        columns = {}
        for f in df.schema.fields:
            fmt = (f.metadata or {}).get("format", "")
            fmt = fmt.rstrip("0123456789.").upper()
            if fmt in catalog:
                columns[f.name] = fmt
    exprs = []
    for f in df.schema.fields:
        fmt = columns.get(f.name)
        if not fmt or fmt not in catalog:
            exprs.append(F.col(f.name))
            continue
        labels = catalog[fmt]
        mapping = F.create_map(
            *chain.from_iterable(
                (F.lit(k), F.lit(v)) for k, v in labels.items()
            )
        )
        exprs.append(
            F.coalesce(
                mapping.getItem(F.col(f.name)),
                F.col(f.name).cast("string"),
            ).alias(f.name)
        )
    return df.select(*exprs)
