"""Stata .dta metadata parsing (header + dictionary + value labels).

Implements the publicly documented Stata dta formats:
- v117/118/119 (XML-tagged sections, Stata 13+): stata.com "dta" help
- v113/114/115 (flat binary, Stata 8-12)

Parity target: the reference's Stata metadata reader
(/root/reference/crates/polars_readstat_rs/src/stata/metadata.rs,
header.rs) — re-derived from the public spec, not translated.

Missing-value sentinels (per the public Stata docs, also used by
pandas.io.stata):
- int8: 101..127 ('.', '.a'..'.z'), int16: 32741..32767,
  int32: 2147483621..2147483647
- float32: bit patterns 0x7f000000 + i*0x800
- float64: bit patterns 0x7fe0000000000000 + i*2^40
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from polars_readstat_spark.sources.fs import fs_open, fs_size

# normalized type codes (the v117+ encoding)
TC_STRL = 32768
TC_DOUBLE = 65526
TC_FLOAT = 65527
TC_LONG = 65528
TC_INT = 65529
TC_BYTE = 65530

_NUMERIC_WIDTH = {TC_DOUBLE: 8, TC_FLOAT: 4, TC_LONG: 4, TC_INT: 2, TC_BYTE: 1}

# old (≤115) numeric type codes → normalized
_OLD_NUMERIC = {251: TC_BYTE, 252: TC_INT, 253: TC_LONG, 254: TC_FLOAT, 255: TC_DOUBLE}

SUPPORTED_VERSIONS = {102, 103, 104, 105, 108, 110, 111, 113, 114, 115,
                      117, 118, 119}


@dataclass
class DtaVar:
    name: str
    typecode: int  # normalized v117-style code
    fmt: str = ""
    lblname: str = ""
    varlabel: str = ""

    @property
    def width(self) -> int:
        """Bytes this variable occupies in a data record."""
        if self.typecode < TC_STRL:
            return self.typecode  # str# fixed width
        if self.typecode == TC_STRL:
            return 8  # (v, o) reference into the strls section
        return _NUMERIC_WIDTH[self.typecode]

    @property
    def kind(self) -> str:
        if self.typecode < TC_STRL:
            return "str"
        return {
            TC_STRL: "strl",
            TC_DOUBLE: "double",
            TC_FLOAT: "float",
            TC_LONG: "long",
            TC_INT: "int",
            TC_BYTE: "byte",
        }[self.typecode]

    @property
    def time_kind(self) -> str | None:
        """Date/datetime promotion from the display format (%td → date,
        %tc/%tC → datetime-ms), matching reference
        src/stata/polars_output.rs:713-780 semantics."""
        f = self.fmt.lstrip("%").lstrip("-0123456789")
        if f.startswith("tc") or f.startswith("tC"):
            return "datetime"
        # %td (modern) and %d... (pre-Stata-10 daily date formats)
        if f.startswith("td") or f.startswith("d"):
            return "date"
        return None


@dataclass
class DtaMeta:
    path: str
    version: int
    little_endian: bool
    nvar: int
    nobs: int
    data_label: str = ""
    timestamp: str = ""
    variables: list[DtaVar] = field(default_factory=list)
    data_offset: int = 0
    strls_offset: int = 0
    value_labels_offset: int = 0
    value_labels: dict[str, dict[int, str]] = field(default_factory=dict)
    encoding: str = "cp1252"

    @property
    def record_width(self) -> int:
        return sum(v.width for v in self.variables)

    @property
    def has_strl(self) -> bool:
        return any(v.typecode == TC_STRL for v in self.variables)

    def var(self, name: str) -> DtaVar:
        for v in self.variables:
            if v.name == name:
                return v
        raise KeyError(name)


class _Cursor:
    def __init__(self, f):
        self.f = f

    def read(self, n: int) -> bytes:
        b = self.f.read(n)
        if len(b) != n:
            raise EOFError(f"unexpected EOF reading {n} bytes")
        return b

    def expect(self, tag: bytes) -> None:
        got = self.read(len(tag))
        if got != tag:
            raise ValueError(f"expected {tag!r}, got {got!r}")

    def seek(self, off: int) -> None:
        self.f.seek(off)

    def tell(self) -> int:
        return self.f.tell()


def _cstr(b: bytes, encoding: str) -> str:
    """Stata C-string semantics: stop at first NUL (reference
    src/sas/value.rs:94-120 analog for Stata fields), with latin-1
    fallback for mis-encoded files (pandas-compatible behavior)."""
    i = b.find(b"\0")
    if i >= 0:
        b = b[:i]
    try:
        return b.decode(encoding)
    except (UnicodeDecodeError, LookupError):
        return b.decode("latin-1")


def parse_dta_meta(path: str, load_value_labels: bool = True) -> DtaMeta:
    """(path, mtime, size)-memoized per load_value_labels flavor
    (sources/metamemo.py; consumers never mutate DtaMeta)."""
    from polars_readstat_spark.sources.metamemo import memoized_parse

    return memoized_parse(
        f"dta:{int(bool(load_value_labels))}",
        path,
        lambda p: _parse_dta_meta(p, load_value_labels),
    )


def _parse_dta_meta(path: str, load_value_labels: bool = True) -> DtaMeta:
    with fs_open(path) as f:
        head = f.read(4)
        f.seek(0)
        cur = _Cursor(f)
        if head.startswith(b"<sta"):
            return _parse_modern(cur, path, load_value_labels)
        return _parse_legacy(cur, path, load_value_labels)


# ---------------------------------------------------------------- v117+


def _parse_modern(cur: _Cursor, path: str, load_value_labels: bool) -> DtaMeta:
    cur.expect(b"<stata_dta><header><release>")
    version = int(cur.read(3))
    if version not in (117, 118, 119):
        raise ValueError(f"unsupported dta release {version}")
    cur.expect(b"</release><byteorder>")
    bo = cur.read(3)
    little = bo == b"LSF"
    e = "<" if little else ">"
    cur.expect(b"</byteorder><K>")
    k_width = 4 if version == 119 else 2
    nvar = struct.unpack(f"{e}{'I' if k_width == 4 else 'H'}", cur.read(k_width))[0]
    cur.expect(b"</K><N>")
    n_width = 4 if version == 117 else 8
    nobs = struct.unpack(f"{e}{'I' if n_width == 4 else 'Q'}", cur.read(n_width))[0]
    cur.expect(b"</N><label>")
    lbl_len_w = 1 if version == 117 else 2
    lbl_len = struct.unpack(f"{e}{'B' if lbl_len_w == 1 else 'H'}", cur.read(lbl_len_w))[0]
    encoding = "cp1252" if version == 117 else "utf-8"
    data_label = cur.read(lbl_len).decode(encoding, errors="replace")
    cur.expect(b"</label><timestamp>")
    ts_len = cur.read(1)[0]
    timestamp = cur.read(ts_len).decode("ascii", errors="replace")
    cur.expect(b"</timestamp></header><map>")
    offsets = struct.unpack(f"{e}14Q", cur.read(14 * 8))

    meta = DtaMeta(
        path=path,
        version=version,
        little_endian=little,
        nvar=nvar,
        nobs=nobs,
        data_label=data_label,
        timestamp=timestamp,
        encoding=encoding,
    )

    name_w = 33 if version == 117 else 129
    fmt_w = 49 if version == 117 else 57
    vlbl_w = 81 if version == 117 else 321
    srt_w = 4 if version == 119 else 2

    # Sequential section parse (sections are contiguous and fixed-size
    # given K) — real-world files carry bogus <map> offsets (some
    # third-party writers emit zeros), so the map is only trusted for
    # the data/strls/value_labels jumps after tag validation, exactly
    # the robustness posture pandas takes.
    cur.expect(b"</map><variable_types>")
    types = struct.unpack(f"{e}{nvar}H", cur.read(2 * nvar))
    cur.expect(b"</variable_types><varnames>")
    names = [_cstr(cur.read(name_w), encoding) for _ in range(nvar)]
    cur.expect(b"</varnames><sortlist>")
    cur.read(srt_w * (nvar + 1))
    cur.expect(b"</sortlist><formats>")
    fmts = [_cstr(cur.read(fmt_w), encoding) for _ in range(nvar)]
    cur.expect(b"</formats><value_label_names>")
    lblnames = [_cstr(cur.read(name_w), encoding) for _ in range(nvar)]
    cur.expect(b"</value_label_names><variable_labels>")
    varlabels = [_cstr(cur.read(vlbl_w), encoding) for _ in range(nvar)]
    cur.expect(b"</variable_labels>")

    meta.variables = [
        DtaVar(names[i], types[i], fmts[i], lblnames[i], varlabels[i])
        for i in range(nvar)
    ]

    def _valid(off: int, tag: bytes) -> bool:
        if off <= 0:
            return False
        here = cur.tell()
        try:
            cur.seek(off)
            ok = cur.read(len(tag)) == tag
        except EOFError:
            ok = False
        cur.seek(here)
        return ok

    # data offset: map[9] when sane, else walk <characteristics>
    if _valid(offsets[9], b"<data>"):
        meta.data_offset = offsets[9] + len(b"<data>")
    else:
        cur.expect(b"<characteristics>")
        while True:
            tag = cur.read(4)
            if tag != b"<ch>":
                # tag is the start of "</characteristics>"
                cur.read(len(b"</characteristics>") - 4 + len(b"<data>"))
                break
            ln = struct.unpack(f"{e}i", cur.read(4))[0]
            cur.read(ln)
            cur.expect(b"</ch>")
        meta.data_offset = cur.tell()

    data_end = meta.data_offset + meta.record_width * nobs
    meta.strls_offset = (
        offsets[10]
        if _valid(offsets[10], b"<strls>")
        else data_end + len(b"</data>")
    )
    if _valid(offsets[11], b"<value_labels>"):
        meta.value_labels_offset = offsets[11]
    else:
        meta.value_labels_offset = _skip_strls(cur, meta.strls_offset, e, version)

    if load_value_labels and any(lblnames):
        meta.value_labels = _parse_modern_value_labels(
            cur, meta.value_labels_offset, e, name_w, encoding
        )
    return meta


def _skip_strls(cur: _Cursor, strls_offset: int, e: str, version: int) -> int:
    """Walk GSO records to find the <value_labels> section start."""
    cur.seek(strls_offset)
    try:
        cur.expect(b"<strls>")
        while True:
            head = cur.read(3)
            if head != b"GSO":
                # head begins "</s" of </strls>
                cur.read(len(b"</strls>") - 3)
                break
            cur.read(8 if version == 117 else 12)
            cur.read(1)
            ln = struct.unpack(f"{e}I", cur.read(4))[0]
            cur.read(ln)
    except (EOFError, ValueError):
        pass
    return cur.tell()


def _parse_modern_value_labels(
    cur: _Cursor, offset: int, e: str, name_w: int, encoding: str
) -> dict[str, dict[int, str]]:
    out: dict[str, dict[int, str]] = {}
    cur.seek(offset)
    cur.expect(b"<value_labels>")
    while True:
        tag = cur.read(5)
        if tag != b"<lbl>":
            break  # </value_labels>
        table_len = struct.unpack(f"{e}i", cur.read(4))[0]
        labname = _cstr(cur.read(name_w), encoding)
        cur.read(3)  # padding
        out[labname] = _parse_label_table(cur.read(table_len), e, encoding)
        cur.expect(b"</lbl>")
    return out


def _parse_label_table(buf: bytes, e: str, encoding: str) -> dict[int, str]:
    """n(4) txtlen(4) off[n] val[n] txt — shared by v113+ and v117+."""
    n, txtlen = struct.unpack_from(f"{e}2i", buf, 0)
    offs = struct.unpack_from(f"{e}{n}i", buf, 8)
    vals = struct.unpack_from(f"{e}{n}i", buf, 8 + 4 * n)
    txt = buf[8 + 8 * n : 8 + 8 * n + txtlen]
    labels: dict[int, str] = {}
    for i in range(n):
        labels[vals[i]] = _cstr(txt[offs[i] :], encoding)
    return labels


# ------------------------------------------------------------- v113-115


def _parse_legacy(cur: _Cursor, path: str, load_value_labels: bool) -> DtaMeta:
    version = cur.read(1)[0]
    if version not in SUPPORTED_VERSIONS or version >= 117:
        # the full 102-119 range is covered (reference claims the same,
        # src/stata/metadata.rs:171-176); 116 was never a released Stata
        # format, and 106/107/109/112 were internal formats no writer
        # emitted — name them so the message doesn't read as a gap
        detail = (
            "116 was never a released Stata dta format"
            if version == 116
            else "supported: 102-105, 108, 110-111, 113-115, 117-119; "
            "106/107/109/112/116 were never released Stata formats"
        )
        raise ValueError(f"unsupported legacy dta version {version} ({detail})")
    bo = cur.read(1)[0]
    # 0x00: legacy 102/103 little-endian writers; 0x01 HILO; 0x02 LOHI
    little = bo in (0x00, 0x02)
    e = "<" if little else ">"
    cur.read(2)  # filetype, unused
    nvar = struct.unpack(f"{e}H", cur.read(2))[0]
    # v102 stores the row count as u16 (public 102 layout)
    nobs = struct.unpack(
        f"{e}{'H' if version == 102 else 'I'}",
        cur.read(2 if version == 102 else 4),
    )[0]
    encoding = "cp1252"
    # field widths by version (public dta specs; same table the
    # reference derives in layout_for_version, stata/metadata.rs:171)
    dlabel_w = 32 if version < 108 else 81
    name_w = 9 if version < 110 else 33
    fmt_w = 7 if version < 105 else (12 if version < 114 else 49)
    vlbl_w = 32 if version < 108 else 81
    data_label = _cstr(cur.read(dlabel_w), encoding)
    timestamp = _cstr(cur.read(18), "ascii") if version >= 105 else ""

    typecodes_raw = cur.read(nvar)
    types = []
    for t in typecodes_raw:
        if version < 111:
            # ancient typlist: ASCII 'b','i','l','f','d'; strings are
            # 0x7F + width
            ch = chr(t)
            if ch in "bilfd":
                types.append(
                    {"b": TC_BYTE, "i": TC_INT, "l": TC_LONG,
                     "f": TC_FLOAT, "d": TC_DOUBLE}[ch]
                )
            elif t > 0x7F:
                types.append(t - 0x7F)  # str width
            else:
                raise ValueError(f"bad v{version} type code {t}")
        elif t in _OLD_NUMERIC:
            types.append(_OLD_NUMERIC[t])
        elif 1 <= t <= 244:
            types.append(t)  # str width
        else:
            raise ValueError(f"bad legacy type code {t}")

    names = [_cstr(cur.read(name_w), encoding) for _ in range(nvar)]
    cur.read(2 * (nvar + 1))  # sortlist
    fmts = [_cstr(cur.read(fmt_w), encoding) for _ in range(nvar)]
    lblnames = [_cstr(cur.read(name_w), encoding) for _ in range(nvar)]
    varlabels = [_cstr(cur.read(vlbl_w), encoding) for _ in range(nvar)]

    # expansion fields: none <105; dt(1)+len(u16) <110; dt(1)+len(u32)
    if version >= 105:
        ln_fmt, ln_w = (f"{e}H", 2) if version < 110 else (f"{e}i", 4)
        while True:
            try:
                dt = cur.read(1)[0]
                ln = struct.unpack(ln_fmt, cur.read(ln_w))[0]
            except EOFError:
                break
            if dt == 0 and ln == 0:
                break
            cur.read(ln)

    meta = DtaMeta(
        path=path,
        version=version,
        little_endian=little,
        nvar=nvar,
        nobs=nobs,
        data_label=data_label,
        timestamp=timestamp,
        encoding=encoding,
    )
    meta.variables = [
        DtaVar(names[i], types[i], fmts[i], lblnames[i], varlabels[i])
        for i in range(nvar)
    ]
    meta.data_offset = cur.tell()
    meta.value_labels_offset = meta.data_offset + meta.record_width * nobs

    if load_value_labels and any(lblnames):
        meta.value_labels = _parse_legacy_value_labels(
            cur, meta.value_labels_offset, e, encoding,
            fs_size(path), version,
        )
    return meta


def _parse_legacy_value_labels(
    cur: _Cursor, offset: int, e: str, encoding: str, file_size: int,
    version: int,
) -> dict[str, dict[int, str]]:
    out: dict[str, dict[int, str]] = {}
    pos = offset
    if version < 108:
        # ancient table (verified against the 102-105 corpus bytes):
        # n(u16), labname(10 = 9-char name + pad), n × int16 values,
        # n × 8-byte label strings
        while pos + 12 <= file_size:
            cur.seek(pos)
            n = struct.unpack(f"{e}H", cur.read(2))[0]
            labname = _cstr(cur.read(10), encoding)
            vals = struct.unpack(f"{e}{n}h", cur.read(2 * n))
            labels = {}
            for i in range(n):
                s = _cstr(cur.read(8), encoding)
                if s:
                    labels[vals[i]] = s
            out[labname] = labels
            pos = pos + 2 + 10 + 10 * n
        return out
    # modern table; the label-set-name field is 9 bytes below v110
    # (verified against the 108/110 corpus bytes), 33 from v110
    labname_w = 9 if version < 110 else 33
    while pos + labname_w + 7 <= file_size:
        cur.seek(pos)
        table_len = struct.unpack(f"{e}i", cur.read(4))[0]
        labname = _cstr(cur.read(labname_w), encoding)
        cur.read(3)
        out[labname] = _parse_label_table(cur.read(table_len), e, encoding)
        pos = pos + 4 + labname_w + 3 + table_len
    return out
