"""SPSS portable (.por) reader.

Implements the publicly documented SPSS portable-file format (PSPP
"Portable File Format" docs): 200-byte vanity header, 256-byte
character translation table, "SPSSPORT" signature, tagged dictionary
records ('1'..'7','8','9','A'..'F'), then base-30 ("trigesimal")
encoded case data wrapped at 80-column lines, 'Z'-filled at EOF.

Parity target: the reference POR reader
(/root/reference/crates/polars_readstat_rs/src/spss/por.rs) — behavior
re-derived from the public spec:
- numbers: [-] base-30 digits [. fraction] [+|- base-30 exponent],
  '/'-terminated; '*.' = system missing;
- strings: base-30 length prefix then raw chars;
- format codes >82 are shifted by 82 before date/time classification
  (a quirk of some SPSS writers, reference __init__.py:405-425);
- temporal values are seconds since 1582-10-14 like SAV.

POR files are small, eager, single-file ASCII — the reference reads
them eagerly in one pass (por.rs:307); a single input partition is the
honest Spark plan. At 100 TB scale POR is a metadata-ish legacy format,
not a data-plane one.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import DataSourceReader, InputPartition

from polars_readstat_spark.sources import strdecode

LINE_LEN = 80
SPSS_SEC_SHIFT = 12_219_379_200
SEC_PER_DAY = 86_400

# POR portable-charset positions → ASCII (public PSPP table):
# 64-73 digits, 74-99 A-Z, 100-125 a-z, then punctuation.
_POS_ASCII: dict[int, str] = {}
for _i in range(10):
    _POS_ASCII[64 + _i] = chr(ord("0") + _i)
for _i in range(26):
    _POS_ASCII[74 + _i] = chr(ord("A") + _i)
    _POS_ASCII[100 + _i] = chr(ord("a") + _i)
for _pos, _ch in zip(
    range(126, 156),
    " .<(+|&[]!$*);^-/|,%_>?`:#@'=\"",
):
    _POS_ASCII[_pos] = _ch
_POS_ASCII[162] = "~"
_POS_ASCII[184] = "{"
_POS_ASCII[185] = "}"
_POS_ASCII[186] = "\\"

DATE_FMTS = {20, 23, 24, 38, 39}
TIME_FMTS = {21, 25}
DATETIME_FMTS = {22, 41}


@dataclass
class PorVar:
    name: str
    width: int  # 0 = numeric
    fmt_type: int = 0
    fmt_width: int = 0
    fmt_dec: int = 0
    label: str = ""
    value_labels: dict = field(default_factory=dict)

    @property
    def is_str(self) -> bool:
        return self.width > 0

    @property
    def time_kind(self) -> str | None:
        if self.is_str:
            return None
        ft = self.fmt_type - 82 if self.fmt_type > 82 else self.fmt_type
        if ft in DATE_FMTS:
            return "date"
        if ft in DATETIME_FMTS:
            return "datetime"
        if ft in TIME_FMTS:
            return "time"
        return None


@dataclass
class PorMeta:
    path: str
    file_label: str
    variables: list
    precision: int = 20


class _PorStream:
    """Logical char stream: strips CR/LF, pads short lines to 80 with
    spaces, maps file bytes through the translation table."""

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.pos = 0  # column within current line
        self.pending = 0
        self.table = {b: chr(b) for b in range(256)}
        self.space = ord(" ")

    def set_table(self, lookup: bytes):
        self.table = {}
        for pos, ch in _POS_ASCII.items():
            self.table[lookup[pos]] = ch
        # '0' fills for padding bytes
        self.table[lookup[64]] = "0"
        self.space = lookup[126]

    def _raw(self) -> int | None:
        if self.pending > 0:
            self.pending -= 1
            return self.space
        if self.i >= len(self.data):
            return None
        b = self.data[self.i]
        self.i += 1
        return b

    def byte(self) -> int:
        while True:
            b = self._raw()
            if b is None:
                raise ValueError("POR: unexpected EOF")
            if b == 0x0D:  # CR(LF)
                if self.i < len(self.data) and self.data[self.i] == 0x0A:
                    self.i += 1
                self.pending = max(LINE_LEN - self.pos, 0)
                self.pos = 0
                continue
            if b == 0x0A:
                self.pending = max(LINE_LEN - self.pos, 0)
                self.pos = 0
                continue
            self.pos += 1
            return b

    def char(self) -> str:
        return self.table.get(self.byte(), "\0")

    def chars(self, n: int) -> str:
        return "".join(self.char() for _ in range(n))

    def raw_bytes(self, n: int) -> bytes:
        return bytes(self.byte() for _ in range(n))

    def double(self, first: str | None = None) -> float:
        c = first if first is not None else self.char()
        if c == "*":
            if self.char() != ".":
                raise ValueError("POR: malformed sysmis")
            return float("nan")
        buf = [c]
        while True:
            c = self.char()
            if c == "/":
                break
            buf.append(c)
        return _parse_base30("".join(buf))

    def integer(self) -> int:
        v = self.double()
        if v != v or v < 0:
            raise ValueError(f"POR: invalid integer {v}")
        return int(v)

    def string(self) -> str:
        n = self.integer()
        return self.chars(n)

    def maybe_double(self) -> float | None:
        c = self.char()
        if c == "Z":
            return None
        return self.double(first=c)

    def maybe_string(self) -> str | None:
        c = self.char()
        if c == "Z":
            return None
        n = self.double(first=c)
        return self.chars(int(n))


def _b30_digit(c: str) -> int:
    if "0" <= c <= "9":
        return ord(c) - ord("0")
    if "A" <= c <= "T":
        return 10 + ord(c) - ord("A")
    raise ValueError(f"POR: bad base-30 digit {c!r}")


def _parse_base30(s: str) -> float:
    i = 0
    neg = i < len(s) and s[i] == "-"
    if neg or (i < len(s) and s[i] == "+"):
        i += 1
    num = 0.0
    while i < len(s) and s[i] not in ".+-":
        num = num * 30.0 + _b30_digit(s[i])
        i += 1
    if i < len(s) and s[i] == ".":
        i += 1
        denom = 30.0
        while i < len(s) and s[i] not in "+-":
            num += _b30_digit(s[i]) / denom
            denom *= 30.0
            i += 1
    if i < len(s):
        exp_neg = s[i] == "-"
        i += 1
        exp = 0.0
        while i < len(s):
            exp = exp * 30.0 + _b30_digit(s[i])
            i += 1
        if exp:
            num *= 30.0 ** (-exp if exp_neg else exp)
    return -num if neg else num


def parse_por(path: str) -> tuple[PorMeta, _PorStream]:
    """Parse dictionary; returns (meta, stream positioned at data)."""
    with open(path, "rb") as f:
        data = f.read()
    st = _PorStream(data)
    vanity = st.raw_bytes(200)
    file_label = vanity[60:80].decode("latin-1").rstrip()
    lookup = st.raw_bytes(256)
    st.set_table(lookup)
    sig = st.chars(8)
    if sig != "SPSSPORT":
        raise ValueError(f"not a POR file: signature {sig!r}")
    _version = st.char()
    _date = st.string()
    _time = st.string()

    variables: list[PorVar] = []
    precision = 20
    while True:
        tag = st.char()
        if tag in "123":
            st.string()
        elif tag == "4":
            st.integer()
        elif tag == "5":
            precision = st.integer()
        elif tag == "6":
            st.string()
        elif tag == "7":
            width = st.integer()
            name = st.string()
            pft, pfw, pfd = st.integer(), st.integer(), st.integer()
            _w1, _w2, _w3 = st.integer(), st.integer(), st.integer()
            variables.append(
                PorVar(name=name, width=width, fmt_type=pft,
                       fmt_width=pfw, fmt_dec=pfd)
            )
        elif tag == "8":
            if variables and variables[-1].is_str:
                st.string()
            else:
                st.double()
        elif tag in "9A":
            st.double()
        elif tag == "B":
            if variables and variables[-1].is_str:
                st.string(), st.string()
            else:
                st.double(), st.double()
        elif tag == "C":
            if variables:
                variables[-1].label = st.string()
            else:
                st.string()
        elif tag == "D":
            n_vars = st.integer()
            names = [st.string() for _ in range(n_vars)]
            is_str = any(
                v.name == names[0] and v.is_str for v in variables
            ) if names else False
            n_labels = st.integer()
            pairs = {}
            for _ in range(n_labels):
                key = st.string() if is_str else st.double()
                pairs[key] = st.string()
            for nm in names:
                for v in variables:
                    if v.name == nm:
                        v.value_labels.update(pairs)
        elif tag == "E":
            n = st.integer()
            for _ in range(n):
                st.string()
        elif tag == "F":
            break
        else:
            raise ValueError(f"POR: unexpected tag {tag!r}")
    return PorMeta(path, file_label, variables, precision), st


def _bulk_chars(st: _PorStream) -> str:
    """Flatten the rest of the stream into one logical char string.

    The per-char state machine costs ~12 µs/value over a 600k-row data
    section; this replaces it with C-speed ops: drain any mid-line
    state through the slow path, then split raw lines, pad each to 80
    with the charset's space byte (what the state machine does on
    newline), and translate all bytes through the charset table at
    once (`bytes.translate`). Tokenization then runs on a str with
    `find`/slicing."""
    trans_b = bytearray(256)  # unmapped bytes → NUL, like _PorStream.char
    for b, ch in st.table.items():
        o = ord(ch)
        trans_b[b] = o if o < 256 else 0
    trans = bytes(trans_b)
    pad = bytes([st.space])

    # mid-line handoff: emit any pending pad spaces, then finish the
    # current raw line, padding to 80 the way the machine would (its
    # column counter includes consumed pads)
    parts = [" " * max(st.pending, 0)]
    eff_pos = st.pos + max(st.pending, 0)
    norm = st.data[st.i :].replace(b"\r\n", b"\n").replace(b"\r", b"\n")
    first, sep, rest = norm.partition(b"\n")
    frag = first.translate(trans).decode("latin-1")
    if sep:
        parts.append(frag + " " * max(LINE_LEN - eff_pos - len(first), 0))
        parts.append(
            b"".join(ln.ljust(LINE_LEN, pad) for ln in rest.split(b"\n"))
            .translate(trans)
            .decode("latin-1")
        )
    else:
        parts.append(frag)
    return "".join(parts)


_B30 = {c: i for i, c in enumerate("0123456789ABCDEFGHIJKLMNOPQRST")}


def _fast_b30(tok: str) -> float:
    """Fast base-30 token parse, bit-identical to _parse_base30.

    Integer parts ≤10 digits go through int(tok, 30) — exact, and
    equal to the float accumulator since every intermediate stays
    below 2^53 (30^10 ≈ 5.9e14). Fractions replay the accumulator's
    exact operation order (num += d/denom; denom *= 30) so the result
    bits match; exponents and oversized tokens fall back."""
    neg = tok[:1] == "-"
    t = tok[1:] if tok[:1] in "+-" else tok
    # split off an exponent suffix (first +/- after the sign)
    ep = t.find("+")
    em = t.find("-")
    cut = min(x for x in (ep, em, len(t)) if x >= 0)
    mant, es = t[:cut], t[cut:]
    dot = mant.find(".")
    try:
        if dot < 0:
            if len(mant) > 10:
                return _parse_base30(tok)
            num = float(int(mant, 30)) if mant else 0.0
        else:
            ip, fp = mant[:dot], mant[dot + 1 :]
            if len(ip) > 10:
                return _parse_base30(tok)
            num = float(int(ip, 30)) if ip else 0.0
            denom = 30.0
            for c in fp:
                num += _B30[c] / denom
                denom *= 30.0
        if es:
            if len(es) > 11:
                return _parse_base30(tok)
            exp = float(int(es[1:], 30)) if len(es) > 1 else 0.0
            if exp:
                num *= 30.0 ** (-exp if es[0] == "-" else exp)
    except (ValueError, KeyError):
        return _parse_base30(tok)
    return -num if neg else num


def read_por_columns(path: str) -> tuple[PorMeta, list[list]]:
    """Eager read of all cases → per-variable python lists (numeric
    float-or-None, string str)."""
    meta, st = parse_por(path)
    s = _bulk_chars(st)
    n = len(s)
    cols: list[list] = [[] for _ in meta.variables]
    n_vars = len(meta.variables)
    is_str = [v.is_str for v in meta.variables]
    cur = 0
    done = False
    while not done:
        row = []
        for j in range(n_vars):
            c = s[cur] if cur < n else "Z"
            if c == "Z":
                done = True
                break
            if c == "*":  # '*.' sysmis (numeric only)
                cur += 2
                row.append(float("nan"))
                continue
            slash = s.find("/", cur)
            if slash < 0:
                done = True
                break
            v = _fast_b30(s[cur:slash])
            cur = slash + 1
            if is_str[j]:
                k = int(v)
                row.append(s[cur : cur + k].rstrip())
                cur += k
            else:
                row.append(v)
        if done or len(row) != n_vars:
            break
        for j in range(n_vars):
            cols[j].append(row[j])
    return meta, cols


class PorPartition(InputPartition):
    pass


class PorReader(DataSourceReader):
    def __init__(self, path: str, options):
        self.path = path
        self.options = dict(options)
        meta, _ = parse_por(path)
        self.meta = meta
        from polars_readstat_spark.sources.datasource import _selected_vars

        self.col_indices = _selected_vars(meta, options)
        v = options.get("value_labels_as_strings")
        self.value_labels_as_strings = (
            str(v).lower() in {"1", "true", "yes"} if v is not None else False
        )
        lim = options.get("n_rows") or options.get("limit")
        self.limit = int(lim) if lim else None
        self.offset = int(options.get("offset") or 0)
        self.row_index_name = options.get("row_index_name")

    def partitions(self):
        return [PorPartition(0)]

    def read(self, partition):
        meta, cols = read_por_columns(self.path)
        n = len(cols[0]) if cols else 0
        start = min(self.offset, n)
        end = n if self.limit is None else min(n, start + self.limit)
        arrays, names = [], []
        for i in self.col_indices:
            v = meta.variables[i]
            vals = cols[i][start:end]
            if v.is_str:
                if self.value_labels_as_strings and v.value_labels:
                    vl = v.value_labels
                    vals = [vl.get(s, s) for s in vals]
                arrays.append(pa.array(vals, type=pa.string()))
            else:
                fv = np.array(
                    [float("nan") if x is None else x for x in vals],
                    dtype=np.float64,
                )
                mask = np.isnan(fv)
                if self.value_labels_as_strings and v.value_labels:
                    vl = v.value_labels
                    out = []
                    for k, x in enumerate(fv):
                        if mask[k]:
                            out.append(None)
                        else:
                            lab = vl.get(float(x))
                            if lab is None:
                                lab = (
                                    str(int(x))
                                    if float(x).is_integer()
                                    else str(float(x))
                                )
                            out.append(lab)
                    arrays.append(pa.array(out, type=pa.string()))
                elif v.time_kind == "date":
                    iv = np.where(mask, 0, fv).astype(np.int64)
                    days = ((iv - SPSS_SEC_SHIFT) / SEC_PER_DAY).astype(np.int64)
                    mask2 = mask | (days < -719_162) | (days > 2_932_896)
                    arrays.append(
                        strdecode.pa_masked(
                            np.where(mask2, 0, days).astype(np.int32),
                            pa.date32(),
                            mask2,
                        )
                    )
                elif v.time_kind == "datetime":
                    iv = np.where(mask, 0, fv).astype(np.int64)
                    secs = iv - SPSS_SEC_SHIFT
                    mask2 = mask | (secs < -62_135_596_800) | (secs > 253_402_300_799)
                    arrays.append(
                        strdecode.pa_masked(
                            np.where(mask2, 0, secs) * 1_000_000,
                            pa.timestamp("us"),
                            mask2,
                        )
                    )
                elif v.time_kind == "time":
                    iv = np.where(mask, 0, fv).astype(np.int64)
                    arrays.append(
                        strdecode.pa_masked(iv * 1_000_000_000, pa.int64(), mask)
                    )
                else:
                    arrays.append(strdecode.pa_masked(fv, pa.float64(), mask))
            names.append(v.name)
        if self.row_index_name:
            arrays.append(pa.array(np.arange(end - start, dtype=np.int64)))
            names.append(self.row_index_name)
        yield pa.RecordBatch.from_arrays(arrays, names=names)
