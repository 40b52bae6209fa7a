"""SAS7BDAT metadata parsing (header + metadata pages).

Implements the publicly documented sas7bdat binary layout (Shotwell's
"SAS7BDAT Database Binary Format" spec; constants cross-checked
against pandas.io.sas, an independent public implementation): 32/64-bit
variants, both endiannesses, SAS codepage table, RLE/RDC compression
detection.

Parity target: the reference's SAS reader metadata layer
(/root/reference/crates/polars_readstat_rs/src/sas/{header,metadata}.rs)
— re-derived from the public spec, not translated.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from polars_readstat_spark.sources.fs import fs_open

MAGIC = (
    b"\x00\x00\x00\x00\x00\x00\x00\x00"
    b"\x00\x00\x00\x00\xc2\xea\x81\x60"
    b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
    b"\x09\xc7\x31\x8c\x18\x1f\x10\x11"
)

PAGE_META_TYPES = (0x0000, 0x4000)
PAGE_DATA_TYPE = 0x0100
PAGE_MIX_TYPE = 0x0200
PAGE_AMD_TYPE = 0x0400
PAGE_TYPE_MASK = 0x0F00
PAGE_TYPE_MASK2 = 0xF000 | PAGE_TYPE_MASK

RLE = b"SASYZCRL"
RDC = b"SASYZCR2"

TRUNCATED_SUBHEADER_ID = 1
COMPRESSED_SUBHEADER_ID = 4
COMPRESSED_SUBHEADER_TYPE = 1

# subheader signature → kind (32-bit and 64-bit spellings)
_SIGS: dict[bytes, str] = {}
for sig32, sig64s, kind in [
    (b"\xf7\xf7\xf7\xf7", [b"\x00\x00\x00\x00\xf7\xf7\xf7\xf7", b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00", b"\xf7\xf7\xf7\xf7\xff\xff\xfb\xfe"], "row_size"),
    (b"\xf6\xf6\xf6\xf6", [b"\x00\x00\x00\x00\xf6\xf6\xf6\xf6", b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00", b"\xf6\xf6\xf6\xf6\xff\xff\xfb\xfe"], "col_size"),
    (b"\x00\xfc\xff\xff", [b"\x00\xfc\xff\xff\xff\xff\xff\xff"], "counts"),
    (b"\xff\xff\xfc\x00", [b"\xff\xff\xff\xff\xff\xff\xfc\x00"], "counts"),
    (b"\xfd\xff\xff\xff", [b"\xfd\xff\xff\xff\xff\xff\xff\xff"], "col_text"),
    (b"\xff\xff\xff\xfd", [b"\xff\xff\xff\xff\xff\xff\xff\xfd"], "col_text"),
    (b"\xff\xff\xff\xff", [b"\xff\xff\xff\xff\xff\xff\xff\xff"], "col_name"),
    (b"\xfc\xff\xff\xff", [b"\xfc\xff\xff\xff\xff\xff\xff\xff"], "col_attrs"),
    (b"\xff\xff\xff\xfc", [b"\xff\xff\xff\xff\xff\xff\xff\xfc"], "col_attrs"),
    (b"\xfe\xfb\xff\xff", [b"\xfe\xfb\xff\xff\xff\xff\xff\xff"], "fmt_label"),
    (b"\xff\xff\xfb\xfe", [b"\xff\xff\xff\xff\xff\xff\xfb\xfe"], "fmt_label"),
    (b"\xfe\xff\xff\xff", [b"\xfe\xff\xff\xff\xff\xff\xff\xff"], "col_list"),
    (b"\xff\xff\xff\xfe", [b"\xff\xff\xff\xff\xff\xff\xff\xfe"], "col_list"),
]:
    _SIGS[sig32] = kind
    for s in sig64s:
        _SIGS[s] = kind

# SAS encoding byte → Python codec, covering every code the reference
# maps (src/sas/encoding.rs:4-83). Where CPython lacks the exact codec
# the closest superset is used (the same concession encoding_rs makes:
# it folds US-ASCII and ISO-8859-1 into WINDOWS-1252): CP921≈ISO-8859-13,
# CP922≈latin1+Š/Ž→latin1, CP1129≈CP1258 (Vietnamese), CP942≈CP932,
# CP1381≈GB2312 family→GB18030 superset, EUC-TW→BIG5 fallback,
# Mac Hebrew/Thai/Ukraine → the generic mac_roman/mac_cyrillic bases.
ENCODINGS = {
    20: "utf-8", 28: "cp1252", 29: "latin1", 30: "latin2", 31: "latin3",
    32: "latin4",
    33: "cyrillic", 34: "arabic", 35: "greek", 36: "hebrew", 37: "latin5",
    38: "latin6", 39: "cp874", 40: "latin9", 41: "cp437", 42: "cp850",
    43: "cp852", 44: "cp857", 45: "cp858", 46: "cp862", 47: "cp864",
    48: "cp865", 49: "cp866", 50: "cp869", 51: "cp874",
    52: "iso8859_13", 53: "latin1", 54: "cp1258", 55: "cp720",
    56: "cp737", 57: "cp775", 58: "cp860", 59: "cp863", 60: "cp1250",
    61: "cp1251", 62: "cp1252", 63: "cp1253", 64: "cp1254", 65: "cp1255",
    66: "cp1256", 67: "cp1257", 68: "cp1258",
    69: "mac_roman", 70: "mac_arabic", 71: "mac_roman", 72: "mac_greek",
    73: "mac_roman", 75: "mac_turkish", 76: "mac_cyrillic",
    118: "cp950", 119: "big5", 123: "big5hkscs",
    125: "gb18030", 126: "cp936", 128: "gb18030", 134: "euc_jp",
    136: "cp949", 137: "cp932", 138: "cp932",
    140: "euc-kr", 141: "cp949", 142: "cp949",
    163: "mac_iceland", 167: "iso2022_jp", 168: "iso2022_kr",
    169: "iso2022_jp", 172: "iso2022_jp",
    205: "gb18030", 227: "latin8", 242: "iso8859_13",
    245: "mac_croatian", 246: "mac_cyrillic", 247: "mac_romanian",
    248: "shift_jis_2004",
}

DATE_FORMATS = frozenset(
    "DATE DAY DDMMYY DOWNAME JULDAY JULIAN MMDDYY MMYY MMYYC MMYYD MMYYP "
    "MMYYS MMYYN MONNAME MONTH MONYY QTR QTRR NENGO WEEKDATE WEEKDATX "
    "WEEKDAY WEEKV WORDDATE WORDDATX YEAR YYMM YYMMC YYMMD YYMMP YYMMS "
    "YYMMN YYMON YYMMDD YYQ YYQC YYQD YYQP YYQS YYQN YYQR YYQRC YYQRD "
    "YYQRP YYQRS YYQRN YYMMDDP YYMMDDC E8601DA YYMMDDN MMDDYYC MMDDYYS "
    "MMDDYYD YYMMDDS B8601DA DDMMYYN YYMMDDD DDMMYYB DDMMYYP MMDDYYP "
    "YYMMDDB MMDDYYN DDMMYYC DDMMYYD DDMMYYS MINGUO".split()
)
DATETIME_FORMATS = frozenset(
    "DATETIME DTWKDATX B8601DN B8601DT B8601DX B8601DZ B8601LX E8601DN "
    "E8601DT E8601DX E8601DZ E8601LX DATEAMPM DTDATE DTMONYY DTYEAR TOD "
    "MDYAMPM".split()
)
TIME_FORMATS = frozenset("TIME HHMM MMSS TIMEAMPM E8601TM B8601TM HOUR".split())


@dataclass
class SasColumn:
    name: str
    offset: int  # byte offset within a row
    width: int
    ctype: str  # 'd' numeric, 's' char
    fmt: str = ""
    label: str = ""

    @property
    def time_kind(self) -> str | None:
        f = self.fmt.upper()
        if f in DATETIME_FORMATS:
            return "datetime"
        if f in DATE_FORMATS:
            return "date"
        if f in TIME_FORMATS:
            return "time"
        return None


@dataclass
class SasMeta:
    path: str
    u64: bool
    little_endian: bool
    encoding: str
    header_length: int
    page_length: int
    page_count: int
    dataset_name: str = ""
    row_length: int = 0
    row_count: int = 0
    mix_page_row_count: int = 0
    col_count: int = 0
    compression: bytes = b""
    columns: list[SasColumn] = field(default_factory=list)

    @property
    def page_bit_offset(self) -> int:
        return 32 if self.u64 else 16

    @property
    def int_len(self) -> int:
        return 8 if self.u64 else 4

    @property
    def subheader_ptr_len(self) -> int:
        return 24 if self.u64 else 12

    def var(self, name: str):
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)


class _PageReader:
    """Shared page/subheader walking used by metadata parse and the
    executor-side row extraction."""

    def __init__(self, meta: SasMeta, page: bytes):
        self.meta = meta
        self.page = page
        e = "<" if meta.little_endian else ">"
        bo = meta.page_bit_offset
        # masked like pandas: keep page-type + compression bits only
        self.page_type = struct.unpack_from(f"{e}H", page, bo)[0] & PAGE_TYPE_MASK2
        self.block_count = struct.unpack_from(f"{e}H", page, bo + 2)[0]
        self.subheader_count = struct.unpack_from(f"{e}H", page, bo + 4)[0]

    def subheader_pointers(self):
        m = self.meta
        e = "<" if m.little_endian else ">"
        i_fmt = "Q" if m.u64 else "I"
        base = m.page_bit_offset + 8
        out = []
        for i in range(self.subheader_count):
            off = base + m.subheader_ptr_len * i
            sh_off, sh_len = struct.unpack_from(f"{e}2{i_fmt}", self.page, off)
            comp = self.page[off + 2 * m.int_len]
            styp = self.page[off + 2 * m.int_len + 1]
            out.append((sh_off, sh_len, comp, styp))
        return out


def _decode(b: bytes, enc: str) -> str:
    try:
        return b.decode(enc)
    except (UnicodeDecodeError, LookupError):
        return b.decode("latin-1", errors="replace")


def parse_sas_meta(path: str) -> SasMeta:
    """(path, mtime, size)-memoized — the wide-file header/column walk
    costs ~0.85 s cold; repeated plans of the same file hit the memo
    (sources/metamemo.py; consumers never mutate SasMeta)."""
    from polars_readstat_spark.sources.metamemo import memoized_parse

    return memoized_parse("sas7bdat", path, _parse_sas_meta)


def _parse_sas_meta(path: str) -> SasMeta:
    with fs_open(path) as f:
        head = f.read(288)
        if head[: len(MAGIC)] != MAGIC:
            raise ValueError("not a sas7bdat file (magic mismatch)")
        u64 = head[32:33] == b"3"
        align1 = 4 if head[35:36] == b"3" else 0
        little = head[37:38] == b"\x01"
        e = "<" if little else ">"
        enc_code = head[70]
        encoding = ENCODINGS.get(enc_code, "cp1252")
        dataset = _decode(head[92:156].rstrip(b"\x00 "), encoding)
        header_length = struct.unpack_from(f"{e}I", head, 196 + align1)[0]
        page_length = struct.unpack_from(f"{e}I", head, 200 + align1)[0]
        page_count = struct.unpack_from(
            f"{e}{'Q' if u64 else 'I'}", head, 204 + align1
        )[0]

        meta = SasMeta(
            path=path,
            u64=u64,
            little_endian=little,
            encoding=encoding,
            header_length=header_length,
            page_length=page_length,
            page_count=page_count,
            dataset_name=dataset,
        )

        # metadata pages: walk until a data/mix page (or data
        # subheaders) appears — reference src/sas/metadata.rs:14
        f.seek(header_length)
        text_blocks: list[bytes] = []
        names: list[str] = []
        offsets: list[int] = []
        lengths: list[int] = []
        types: list[str] = []
        fmts: list[tuple[int, int, int]] = []
        labels: list[tuple[int, int, int]] = []
        i_fmt = "Q" if u64 else "I"
        int_len = meta.int_len

        for _page_idx in range(page_count):
            page = f.read(page_length)
            if len(page) < page_length:
                break
            pr = _PageReader(meta, page)
            ptype = pr.page_type
            has_data_sh = False
            if ptype in PAGE_META_TYPES + (PAGE_MIX_TYPE, PAGE_AMD_TYPE):
                for sh_off, sh_len, comp, styp in pr.subheader_pointers():
                    if sh_len == 0 or comp == TRUNCATED_SUBHEADER_ID:
                        continue
                    sig_len = int_len
                    sig = page[sh_off : sh_off + sig_len]
                    kind = _SIGS.get(sig) or _SIGS.get(sig[:4])
                    if kind is None:
                        if meta.compression and comp in (0, COMPRESSED_SUBHEADER_ID) and styp == COMPRESSED_SUBHEADER_TYPE:
                            has_data_sh = True
                            continue
                        raise ValueError(f"unknown subheader signature {sig!r}")
                    if kind == "row_size":
                        meta.row_length = struct.unpack_from(f"{e}{i_fmt}", page, sh_off + 5 * int_len)[0]
                        meta.row_count = struct.unpack_from(f"{e}{i_fmt}", page, sh_off + 6 * int_len)[0]
                        meta.mix_page_row_count = struct.unpack_from(f"{e}{i_fmt}", page, sh_off + 15 * int_len)[0]
                        lcs_off = sh_off + (682 if u64 else 354)
                        lcp_off = sh_off + (706 if u64 else 378)
                        meta._lcs = struct.unpack_from(f"{e}H", page, lcs_off)[0]
                        meta._lcp = struct.unpack_from(f"{e}H", page, lcp_off)[0]
                    elif kind == "col_size":
                        meta.col_count = struct.unpack_from(f"{e}{i_fmt}", page, sh_off + int_len)[0]
                    elif kind == "col_text":
                        tb_size = struct.unpack_from(f"{e}H", page, sh_off + int_len)[0]
                        blob = page[sh_off + int_len : sh_off + int_len + tb_size]
                        text_blocks.append(blob.rstrip(b"\x00 "))
                        if len(text_blocks) == 1:
                            for lit in (RLE, RDC):
                                if lit in text_blocks[0]:
                                    meta.compression = lit
                    elif kind == "col_name":
                        n_ptrs = (sh_len - 2 * int_len - 12) // 8
                        for k in range(n_ptrs):
                            base = sh_off + int_len + 8 * (k + 1)
                            idx, noff, nlen = struct.unpack_from(f"{e}3H", page, base)
                            idx = min(idx, len(text_blocks) - 1)
                            names.append(
                                _decode(
                                    text_blocks[idx][noff : noff + nlen], encoding
                                )
                            )
                    elif kind == "col_attrs":
                        n_vec = (sh_len - 2 * int_len - 12) // (int_len + 8)
                        for k in range(n_vec):
                            base = sh_off + int_len + 8 + k * (int_len + 8)
                            offsets.append(struct.unpack_from(f"{e}{i_fmt}", page, base)[0])
                            lengths.append(
                                struct.unpack_from(f"{e}I", page, sh_off + 2 * int_len + 8 + k * (int_len + 8))[0]
                            )
                            t = page[sh_off + 2 * int_len + 14 + k * (int_len + 8)]
                            types.append("d" if t == 1 else "s")
                    elif kind == "fmt_label":
                        b0 = sh_off + 3 * int_len
                        fidx, foff, flen = struct.unpack_from(f"{e}3H", page, b0 + 22)
                        lidx, loff, llen = struct.unpack_from(f"{e}3H", page, b0 + 28)
                        fmts.append((fidx, foff, flen))
                        labels.append((lidx, loff, llen))
                    # counts / col_list: no-op
            if has_data_sh or ptype in (PAGE_DATA_TYPE, PAGE_MIX_TYPE):
                break

    n = len(names)
    cols = []
    for i in range(n):
        fmt = lab = ""
        if i < len(fmts):
            fidx, foff, flen = fmts[i]
            fidx = min(fidx, len(text_blocks) - 1)
            fmt = _decode(text_blocks[fidx][foff : foff + flen], encoding)
        if i < len(labels):
            lidx, loff, llen = labels[i]
            lidx = min(lidx, len(text_blocks) - 1)
            lab = _decode(text_blocks[lidx][loff : loff + llen], encoding)
        cols.append(
            SasColumn(names[i], offsets[i], lengths[i], types[i], fmt, lab)
        )
    meta.columns = cols
    return meta
