"""SPSS .sav/.zsav metadata parsing (header + dictionary records).

Implements the publicly documented SPSS system-file format (the PSPP
project documents it in full: "System File Format", pspp dev docs):
header record, variable records (type 2), value labels (3/4),
documents (6), extension records (7, subtypes 3/4/11/13/14/20/21/22),
dictionary terminator (999), then case data (uncompressed, bytecode-
compressed, or zsav zlib blocks).

Parity target: the reference's SPSS reader
(/root/reference/crates/polars_readstat_rs/src/spss/metadata.rs,
types.rs) — behavior re-derived from the public spec, not translated.

Notable behaviors matched:
- endianness from layout_code (byte-swap everything if it reads as
  0x02000000), `$FL2` (sav) vs `$FL3` (zsav) magic;
- very-long strings (>255 bytes) are segmented into 255-byte-wide
  variables (subtype 14 declares the true width); segments coalesce
  into one logical column (reference metadata.rs:274-308);
- names/labels are decoded with the file's encoding, which may only be
  declared *after* them (subtype 20 / subtype 3 codepage) — so raw
  bytes are kept during the parse and decoded in a finalize pass
  (reference re-decode, metadata_df.rs:120-146);
- declared missing values: up to 3 discrete doubles, or a range plus
  at most one discrete (negative n_missing) (reference
  data.rs:998-1026).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from polars_readstat_spark.sources.fs import fs_open

HEADER_LEN = 176

# format-type codes (public PSPP table) that promote a numeric column
DATE_FMTS = {20, 23, 24, 38, 39}  # DATE ADATE JDATE EDATE SDATE
TIME_FMTS = {21, 25}  # TIME DTIME
DATETIME_FMTS = {22, 41}  # DATETIME YMDHMS

FMT_NAMES = {
    1: "A", 2: "AHEX", 3: "COMMA", 4: "DOLLAR", 5: "F", 6: "IB",
    7: "PIBHEX", 8: "P", 9: "PIB", 10: "PK", 11: "RB", 12: "RBHEX",
    15: "Z", 16: "N", 17: "E", 20: "DATE", 21: "TIME", 22: "DATETIME",
    23: "ADATE", 24: "JDATE", 25: "DTIME", 26: "WKDAY", 27: "MONTH",
    28: "MOYR", 29: "QYR", 30: "WKYR", 31: "PCT", 32: "DOT",
    33: "CCA", 34: "CCB", 35: "CCC", 36: "CCD", 37: "CCE",
    38: "EDATE", 39: "SDATE", 40: "MTIME", 41: "YMDHMS",
}

# IBM/Microsoft codepage → python codec (common subset; the reference
# carries a much longer table in spss/metadata.rs:920-970)
CODEPAGES = {
    2: "ascii", 3: "cp1252", 437: "cp437", 850: "cp850", 852: "cp852",
    855: "cp855", 857: "cp857", 858: "cp858", 862: "cp862", 866: "cp866",
    874: "cp874", 932: "cp932", 936: "gbk", 949: "cp949", 950: "big5",
    1200: "utf-16-le", 1201: "utf-16-be", 1250: "cp1250", 1251: "cp1251",
    1252: "cp1252", 1253: "cp1253", 1254: "cp1254", 1255: "cp1255",
    1256: "cp1256", 1257: "cp1257", 1258: "cp1258", 10000: "mac-roman",
    20127: "ascii", 28591: "latin-1", 28592: "iso8859-2",
    28593: "iso8859-3", 28594: "iso8859-4", 28595: "iso8859-5",
    28596: "iso8859-6", 28597: "iso8859-7", 28598: "iso8859-8",
    28599: "iso8859-9", 28605: "iso8859-15", 51949: "euc-kr",
    54936: "gb18030", 65001: "utf-8",
}

SYSMIS_BITS = 0xFFEFFFFFFFFFFFFF  # -DBL_MAX
LOWEST_BITS = 0xFFEFFFFFFFFFFFFE
HIGHEST_BITS = 0x7FEFFFFFFFFFFFFF


@dataclass
class SavVar:
    name: str  # long name when declared (subtype 13), else short
    short_name: str
    is_str: bool
    string_len: int  # declared byte width (0 for numeric)
    width_el: int  # 8-byte elements occupied (post very-long coalesce)
    start_el: int  # first 8-byte element index in a case
    fmt_type: int = 0
    fmt_width: int = 0
    fmt_dec: int = 0
    label: str = ""
    missing_doubles: tuple = ()
    missing_range: bool = False
    missing_strings: tuple = ()
    measure: int = 0
    display_width: int = 0
    alignment: int = 0
    value_labels: dict = field(default_factory=dict)  # float|str → label

    @property
    def fmt(self) -> str:
        n = FMT_NAMES.get(self.fmt_type, "")
        if not n:
            return ""
        s = f"{n}{self.fmt_width}"
        if self.fmt_dec:
            s += f".{self.fmt_dec}"
        return s

    @property
    def time_kind(self) -> str | None:
        if self.is_str:
            return None
        if self.fmt_type in DATE_FMTS:
            return "date"
        if self.fmt_type in DATETIME_FMTS:
            return "datetime"
        if self.fmt_type in TIME_FMTS:
            return "time"
        return None


@dataclass
class ZsavInfo:
    ztrailer_ofs: int
    block_size: int
    # per block: (compressed_ofs, compressed_size, uncompressed_size)
    blocks: list


@dataclass
class SavMeta:
    path: str
    little_endian: bool
    compression: int  # 0 none, 1 bytecode, 2 zsav
    bias: float
    nobs: int
    case_size: int  # 8-byte elements per case
    variables: list  # list[SavVar]
    data_offset: int
    encoding: str
    sysmis: float
    file_label: str = ""
    documents: list = field(default_factory=list)
    zsav: ZsavInfo | None = None

    @property
    def record_width(self) -> int:
        return self.case_size * 8


class _RawVar:
    """Pre-finalize variable: names/labels still raw bytes."""

    __slots__ = (
        "short_raw", "is_str", "string_len", "width_el", "start_el",
        "fmt_type", "fmt_width", "fmt_dec", "label_raw",
        "missing_doubles", "missing_range", "missing_strings_raw",
        "measure", "display_width", "alignment", "value_labels_raw",
        "long_raw",
    )

    def __init__(self):
        self.label_raw = b""
        self.missing_doubles = ()
        self.missing_range = False
        self.missing_strings_raw = ()
        self.measure = 0
        self.display_width = 0
        self.alignment = 0
        self.value_labels_raw = []
        self.long_raw = None


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise ValueError("sav: unexpected EOF in dictionary")
    return b


def parse_sav_meta(path: str) -> SavMeta:
    """(path, mtime, size)-memoized (sources/metamemo.py; consumers
    never mutate SavMeta)."""
    from polars_readstat_spark.sources.metamemo import memoized_parse

    return memoized_parse("sav", path, _parse_sav_meta)


def _parse_sav_meta(path: str) -> SavMeta:
    with fs_open(path) as f:
        hdr = _read_exact(f, HEADER_LEN)
        magic = hdr[:4]
        if magic not in (b"$FL2", b"$FL3"):
            raise ValueError(f"not an SPSS system file: magic {magic!r}")
        layout = struct.unpack("<i", hdr[64:68])[0]
        little = layout in (2, 3)
        e = "<" if little else ">"
        (layout, case_size, compression, _weight_idx, ncases) = struct.unpack(
            e + "5i", hdr[64:84]
        )
        bias = struct.unpack(e + "d", hdr[84:92])[0]
        file_label_raw = hdr[109:173]

        raw_vars: list[_RawVar] = []
        el_count = 0  # 8-byte elements seen so far
        el_owner: dict[int, int] = {}  # 0-based element idx → var idx
        pending_labels: list[tuple[list, list]] = []  # (pairs, el_indices)
        doc_raw: list[bytes] = []
        codepage = None
        enc_name_raw = None
        sysmis = struct.unpack("<d", struct.pack("<Q", SYSMIS_BITS))[0]
        display_raw = None
        long_names_raw = None
        very_long_raw = None
        lsvl_raw = None  # subtype 21
        lsmv_raw = None  # subtype 22

        while True:
            rec = struct.unpack(e + "i", _read_exact(f, 4))[0]
            if rec == 999:
                _read_exact(f, 4)
                break
            if rec == 2:
                vtype, has_label, n_missing, prfmt, wrfmt = struct.unpack(
                    e + "5i", _read_exact(f, 20)
                )
                name_raw = _read_exact(f, 8)
                label_raw = b""
                if has_label:
                    ln = struct.unpack(e + "i", _read_exact(f, 4))[0]
                    label_raw = _read_exact(f, (ln + 3) // 4 * 4)[:ln]
                miss_d: list[float] = []
                miss_s: list[bytes] = []
                if n_missing:
                    cnt = abs(n_missing)
                    blob = _read_exact(f, 8 * cnt)
                    if vtype == 0:
                        miss_d = list(struct.unpack(e + f"{cnt}d", blob))
                    else:
                        miss_s = [blob[i * 8 : i * 8 + 8] for i in range(cnt)]
                if vtype == -1:
                    # string continuation: occupies one element
                    if raw_vars:
                        el_owner[el_count] = len(raw_vars) - 1
                    el_count += 1
                    continue
                rv = _RawVar()
                rv.short_raw = name_raw.rstrip(b" \0")
                rv.is_str = vtype > 0
                rv.string_len = vtype if vtype > 0 else 0
                rv.width_el = 1  # continuations add to el_count only
                rv.start_el = el_count
                rv.fmt_type = (prfmt >> 16) & 0xFF
                rv.fmt_width = (prfmt >> 8) & 0xFF
                rv.fmt_dec = prfmt & 0xFF
                rv.label_raw = label_raw
                rv.missing_doubles = tuple(miss_d)
                rv.missing_range = n_missing < 0
                rv.missing_strings_raw = tuple(miss_s)
                el_owner[el_count] = len(raw_vars)
                el_count += 1
                raw_vars.append(rv)
            elif rec == 3:
                n = struct.unpack(e + "i", _read_exact(f, 4))[0]
                pairs = []
                for _ in range(n):
                    val = _read_exact(f, 8)
                    lab_len = _read_exact(f, 1)[0]
                    padded = (lab_len + 1 + 7) // 8 * 8 - 1
                    lab = _read_exact(f, padded)[:lab_len]
                    pairs.append((val, lab))
                rec4 = struct.unpack(e + "i", _read_exact(f, 4))[0]
                if rec4 != 4:
                    raise ValueError("sav: value-label record not followed by type 4")
                nv = struct.unpack(e + "i", _read_exact(f, 4))[0]
                idxs = struct.unpack(e + f"{nv}i", _read_exact(f, 4 * nv))
                pending_labels.append((pairs, list(idxs)))
            elif rec == 6:
                n = struct.unpack(e + "i", _read_exact(f, 4))[0]
                for _ in range(n):
                    doc_raw.append(_read_exact(f, 80).rstrip(b" "))
            elif rec == 7:
                subtype, size, count = struct.unpack(e + "3i", _read_exact(f, 12))
                blob = _read_exact(f, size * count)
                if subtype == 3 and size * count >= 32:
                    codepage = struct.unpack(e + "8i", blob[:32])[7]
                elif subtype == 4 and size * count >= 8:
                    sysmis = struct.unpack(e + "d", blob[:8])[0]
                elif subtype == 11:
                    display_raw = (blob, count)
                elif subtype == 13:
                    long_names_raw = blob
                elif subtype == 14:
                    very_long_raw = blob
                elif subtype == 20:
                    enc_name_raw = blob
                elif subtype == 21:
                    lsvl_raw = blob
                elif subtype == 22:
                    lsmv_raw = blob
            else:
                raise ValueError(f"sav: unknown dictionary record type {rec}")

        data_offset = f.tell()

        # ---- encoding resolution (subtype 20 wins over codepage) ----
        encoding = "cp1252"
        if codepage is not None:
            encoding = CODEPAGES.get(codepage, "cp1252")
        if enc_name_raw:
            n = enc_name_raw.decode("ascii", "ignore").strip().strip("\0").lower()
            alias = {
                "utf-8": "utf-8", "utf8": "utf-8",
                "windows-1252": "cp1252", "cp1252": "cp1252",
                "iso-8859-1": "latin-1", "latin1": "latin-1",
            }
            encoding = alias.get(n, n or encoding)
        try:
            b"".decode(encoding)
        except LookupError:
            encoding = "cp1252"

        def dec(b: bytes) -> str:
            try:
                return b.decode(encoding)
            except (UnicodeDecodeError, LookupError):
                return b.decode("latin-1")

        # ---- value labels → owning variables -----------------------
        for pairs, idxs in pending_labels:
            for el_idx in idxs:
                vi = el_owner.get(el_idx - 1)
                if vi is None:
                    continue
                raw_vars[vi].value_labels_raw.extend(pairs)

        # ---- long names (subtype 13): short=long \t pairs -----------
        if long_names_raw:
            by_short = {rv.short_raw.upper(): rv for rv in raw_vars}
            for pair in long_names_raw.split(b"\t"):
                if b"=" in pair:
                    s, ln = pair.split(b"=", 1)
                    rv = by_short.get(s.strip().upper())
                    if rv is not None:
                        rv.long_raw = ln

        # ---- very long strings (subtype 14): short=width pairs ------
        true_widths: dict[bytes, int] = {}
        if very_long_raw:
            for pair in very_long_raw.replace(b"\x00", b"").split(b"\t"):
                if b"=" in pair:
                    s, w = pair.split(b"=", 1)
                    try:
                        true_widths[s.strip().upper()] = int(w)
                    except ValueError:
                        pass

        # continuation elements: width_el from element ownership
        for i, rv in enumerate(raw_vars):
            nxt = (
                raw_vars[i + 1].start_el if i + 1 < len(raw_vars) else el_count
            )
            rv.width_el = nxt - rv.start_el

        # ---- coalesce very-long-string segments ---------------------
        # A declared width W>255 is stored as ceil(W/252) segment
        # variables; data payload is 255 bytes per 256-byte chunk
        # (reference metadata.rs:274-308, data.rs:1028-1048).
        merged: list[_RawVar] = []
        i = 0
        while i < len(raw_vars):
            rv = raw_vars[i]
            true_w = true_widths.get(rv.short_raw.upper())
            if rv.is_str and true_w and true_w > 255:
                n_seg = (true_w + 251) // 252
                segs = raw_vars[i : i + n_seg]
                rv.width_el = sum(s.width_el for s in segs)
                rv.string_len = true_w
                merged.append(rv)
                i += n_seg
            else:
                merged.append(rv)
                i += 1
        raw_vars = merged

        # ---- display params (subtype 11) ----------------------------
        if display_raw:
            blob, count = display_raw
            nv = len(raw_vars)
            total_seg = sum(max(rv.width_el // 32, 1) if rv.is_str else 1
                            for rv in raw_vars)
            if count == nv * 3:
                per, step_seg = 3, False
            elif count == nv * 2:
                per, step_seg = 2, False
            elif count == total_seg * 3:
                per, step_seg = 3, True
            elif count == total_seg * 2:
                per, step_seg = 2, True
            else:
                per, step_seg = 0, False
            if per:
                vals = struct.unpack(e + f"{count}i", blob)
                pos = 0
                for rv in raw_vars:
                    rv.measure = vals[pos]
                    if per == 3:
                        rv.display_width = vals[pos + 1]
                        rv.alignment = vals[pos + 2]
                    else:
                        rv.alignment = vals[pos + 1]
                    nseg = (max(rv.width_el // 32, 1) if rv.is_str else 1) if step_seg else 1
                    pos += per * nseg

        # ---- finalize → SavVar --------------------------------------
        variables: list[SavVar] = []
        for rv in raw_vars:
            short = dec(rv.short_raw)
            name = dec(rv.long_raw) if rv.long_raw else short
            vl: dict = {}
            for val, lab in rv.value_labels_raw:
                if rv.is_str:
                    vl[dec(val).rstrip()] = dec(lab)
                else:
                    vl[struct.unpack(e + "d", val)[0]] = dec(lab)
            variables.append(
                SavVar(
                    name=name,
                    short_name=short,
                    is_str=rv.is_str,
                    string_len=rv.string_len,
                    width_el=rv.width_el,
                    start_el=rv.start_el,
                    fmt_type=rv.fmt_type,
                    fmt_width=rv.fmt_width,
                    fmt_dec=rv.fmt_dec,
                    label=dec(rv.label_raw),
                    missing_doubles=rv.missing_doubles,
                    missing_range=rv.missing_range,
                    missing_strings=tuple(
                        dec(s).rstrip() for s in rv.missing_strings_raw
                    ),
                    measure=rv.measure,
                    display_width=rv.display_width,
                    alignment=rv.alignment,
                    value_labels=vl,
                )
            )

        # ---- long string value labels (subtype 21) ------------------
        if lsvl_raw:
            by_name = {v.name.upper(): v for v in variables}
            by_name.update({v.short_name.upper(): v for v in variables})
            pos = 0
            b = lsvl_raw
            while pos + 12 <= len(b):
                nl = struct.unpack(e + "i", b[pos : pos + 4])[0]
                pos += 4
                vname = dec(b[pos : pos + nl])
                pos += nl
                _width, n_labels = struct.unpack(e + "2i", b[pos : pos + 8])
                pos += 8
                var = by_name.get(vname.upper())
                for _ in range(n_labels):
                    vl_len = struct.unpack(e + "i", b[pos : pos + 4])[0]
                    pos += 4
                    val = dec(b[pos : pos + vl_len]).rstrip()
                    pos += vl_len
                    lb_len = struct.unpack(e + "i", b[pos : pos + 4])[0]
                    pos += 4
                    lab = dec(b[pos : pos + lb_len])
                    pos += lb_len
                    if var is not None:
                        var.value_labels[val] = lab
        # ---- long string missing values (subtype 22) ----------------
        if lsmv_raw:
            by_name = {v.name.upper(): v for v in variables}
            by_name.update({v.short_name.upper(): v for v in variables})
            pos = 0
            b = lsmv_raw
            while pos + 4 <= len(b):
                nl = struct.unpack(e + "i", b[pos : pos + 4])[0]
                pos += 4
                vname = dec(b[pos : pos + nl])
                pos += nl
                if pos >= len(b):
                    break
                n_miss = b[pos]
                pos += 1
                vals = []
                for _ in range(n_miss):
                    vlen = struct.unpack(e + "i", b[pos : pos + 4])[0]
                    pos += 4
                    vals.append(dec(b[pos : pos + vlen]).rstrip())
                    pos += vlen
                var = by_name.get(vname.upper())
                if var is not None:
                    var.missing_strings = tuple(
                        set(var.missing_strings) | set(vals)
                    )

        # ---- zsav block index ---------------------------------------
        zsav = None
        if magic == b"$FL3" or compression == 2:
            zh = _read_exact(f, 24)
            _zhdr_ofs, ztrailer_ofs, ztrailer_len = struct.unpack(e + "3q", zh)
            f.seek(ztrailer_ofs)
            tr = _read_exact(f, ztrailer_len)
            _int_bias, _zero, block_size, n_blocks = struct.unpack(
                e + "qqii", tr[:24]
            )
            blocks = []
            for i in range(n_blocks):
                off = 24 + i * 24
                _unc_ofs, c_ofs, unc_sz, c_sz = struct.unpack(
                    e + "qqii", tr[off : off + 24]
                )
                blocks.append((c_ofs, c_sz, unc_sz))
            zsav = ZsavInfo(ztrailer_ofs, block_size, blocks)
            compression = 2
            data_offset += 24  # first compressed block starts after zheader

        # row count: header may say -1 (unknown) — leave; decode counts
        nobs = ncases if ncases >= 0 else -1

        return SavMeta(
            path=path,
            little_endian=little,
            compression=compression,
            bias=bias,
            nobs=nobs,
            case_size=case_size if case_size > 0 else el_count,
            variables=variables,
            data_offset=data_offset,
            encoding=encoding,
            sysmis=sysmis,
            file_label=dec(file_label_raw.rstrip(b" \0")),
            documents=[dec(d) for d in doc_raw],
            zsav=zsav,
        )


def read_compressed_stream(meta: SavMeta) -> bytes:
    """Raw bytecode stream bytes: the on-disk tail (compression=1) or
    the concatenation of independently-decompressed zlib blocks
    (compression=2; blocks are self-contained zlib streams, reference
    spss/data.rs:1794-1860)."""
    with fs_open(meta.path) as f:
        if meta.compression == 2:
            out = []
            for c_ofs, c_sz, _unc in meta.zsav.blocks:
                f.seek(c_ofs)
                out.append(zlib.decompress(f.read(c_sz)))
            return b"".join(out)
        f.seek(meta.data_offset)
        return f.read()
