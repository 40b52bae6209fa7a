"""SPSS portable (.por) writer — reference W5 re-expressed.

Public spec (PSPP "Portable File Format"): 200-byte vanity header,
256-byte translation table, "SPSSPORT" signature, tagged dictionary
records, base-30 encoded values wrapped at 80-column lines, 'Z'
padding at EOF.

Numbers are written as the shortest base-30 token that reads back
faithfully (_shortest_b30: positional cut, integer-mantissa × 30^±e,
or the full expansion — every candidate verified through the actual
parser), '/'-terminated; '*.' for missing (same grammar our reader
parses). Read-back is exact for ~86% of full-precision doubles and
never less accurate than the flat 50-digit expansion, whose fraction
accumulation is ~1 ulp lossy — the same approximation the C
readstat/pyreadstat parsers make. Subnormal magnitudes degrade
further (the parser's 30**exp scale underflows before the mantissa
contributes; 5e-324 flushes to zero) — IEEE gradual-underflow
semantics at the format's edge.

POR is an eager single file (the format is legacy interchange, not a
data-plane format at scale); token packing — the expensive per-value
shortest-form ladder — runs on the executors (iter_packed_chunks,
integer fast path + per-chunk memo), and the driver only concatenates
chunk payloads in partition order and wraps the stream at 80 columns
with one numpy pass per chunk, so memory stays bounded.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_readstat_spark.sources.por.b30 import _parse_base30
from polars_readstat_spark.writers import ts_epoch_seconds


from polars_readstat_spark.sources.por.reader import (
    _POS_ASCII,
    SPSS_SEC_SHIFT,
)
def _por_safe_table() -> bytes:
    """latin-1 byte → portable-charset byte; anything outside the
    portable charset becomes '?'. The format cannot carry other bytes:
    an embedded newline would be eaten by the reader's 80-column
    line padding and shift the whole stream, and unmapped bytes decode
    to NUL — sanitizing at write time keeps the structure sound and
    the roundtrip deterministic."""
    t = bytearray(b"?" * 256)
    for ch in set(_POS_ASCII.values()):
        o = ord(ch)
        if o < 256:
            t[o] = o
    return bytes(t)


_POR_SAFE = _por_safe_table()


LINE_LEN = 80
PRECISION = 50


class _PorWriter:
    def __init__(self, fh):
        self.fh = fh
        self.pos = 0

    def byte(self, b: int):
        self.fh.write(bytes([b]))
        self.pos += 1
        if self.pos == LINE_LEN:
            self.fh.write(b"\r\n")
            self.pos = 0

    def write(self, s: bytes | str):
        if isinstance(s, str):
            s = s.encode("latin-1", "replace")
        for b in s:
            self.byte(b)

    def b30_int(self, n: int):
        if n == 0:
            self.write("0")
            return
        digits = []
        while n > 0:
            d = n % 30
            digits.append(chr(ord("0") + d) if d < 10 else chr(ord("A") + d - 10))
            n //= 30
        self.write("".join(reversed(digits)))

    def double(self, v: float | None):
        if v is None or v != v:
            self.write("*.")
            return
        if v in (float("inf"), float("-inf")):
            self.write("-1+TT/" if v < 0 else "1+TT/")
            return
        if v < 0:
            self.write("-")
        self.write(_shortest_b30(abs(v)))
        self.write("/")

    @staticmethod
    def _b30s(n: int) -> str:
        s = ""
        while n > 0:
            s += "x"
            n //= 30
        return s or "x"

    def string(self, s: str):
        b = s.encode("latin-1", "replace").translate(_POR_SAFE)
        self.b30_int(len(b))
        self.write("/")
        self.write(b)

    def finish(self):
        while self.pos != 0:
            self.byte(ord("Z"))


_B30_POW11 = 30.0 ** 11


def _num_token(v: float) -> str:
    """One numeric cell -> '/'-terminated token (same emission as
    _PorWriter.double). Integers below 30^11 skip the ladder: the
    emission (int(a) rendered in base 30) is exact, and every reader
    route reproduces a bit-for-bit — NOT because 30^11 < 2^53 (it is
    not: 30^11 ≈ 1.77e16 > 2^53 ≈ 9.0e15), but because an 11-digit
    parse is one correctly-rounded conversion of the exact integer N
    on both reader paths: int(tok,30)→float rounds once, and the
    scalar accumulator's first 10 steps are exact (< 30^10 < 2^53)
    while its 11th step's num*30 is an EVEN integer < 2^54 (exactly
    representable), so the final +d is a single rounding of N too.
    Since a is itself a double with N == a, fl(N) == a. The proof
    stops at 11 digits. Boundary pinned in
    tests/test_por_reader.py::test_integer_fast_path_boundary_pins.
    Covers keys, counts, and seconds-since-1582 date/datetime
    values."""
    if v in (float("inf"), float("-inf")):
        return "-1+TT/" if v < 0 else "1+TT/"
    sign = "-" if v < 0 else ""
    a = abs(v)
    if a < _B30_POW11 and a.is_integer():
        return sign + _b30_int_str(int(a)) + "/"
    return sign + _shortest_b30(a) + "/"


def _pack_por_chunk(pdf, kinds) -> bytes:
    """Executor-side pack of one pandas chunk into the unwrapped
    logical token stream (wrapping is a driver-side numpy pass)."""
    cols = []
    for i, k in enumerate(kinds):
        s = pdf.iloc[:, i]
        if k == "str":
            cells = []
            for x in s.tolist():
                b = (x if x is not None else "").encode(
                    "latin-1", "replace"
                ).translate(_POR_SAFE)
                cells.append(_b30_int_str(len(b)) + "/" + b.decode("latin-1"))
            cols.append(cells)
        else:
            memo: dict = {}
            cells = []
            for v in s.tolist():
                if v is None or v != v:
                    cells.append("*.")
                    continue
                t = memo.get(v)
                if t is None:
                    t = _num_token(v)
                    memo[v] = t
                cells.append(t)
            cols.append(cells)
    parts = []
    for r in range(len(pdf)):
        for c in cols:
            parts.append(c[r])
    return "".join(parts).encode("latin-1", "replace")


def _b30_chr(d: int) -> str:
    return chr(ord("0") + d) if d < 10 else chr(ord("A") + d - 10)


def _b30_int_str(n: int) -> str:
    if n == 0:
        return "0"
    out = []
    while n:
        out.append(_b30_chr(n % 30))
        n //= 30
    return "".join(reversed(out))


def _render_b30(a: float, budget: int, rounded: bool) -> str | None:
    """Token text (no sign, no '/') for abs value a, with at most
    `budget` significant base-30 digits, optionally rounding the cut
    digit (carry-propagated; None when the carry can't be applied
    cleanly, e.g. it would renormalize the exponent form)."""
    if 0.0 < a < 1.0 / 30.0:
        # mantissa × 30^-E (the plain positional form would spend the
        # whole budget on leading zeros)
        m, e = a, 0
        while m < 1.0:
            m *= 30.0
            e += 1
        digits = [int(m)]
        frac = m - digits[0]
        while frac != 0.0 and len(digits) < budget:
            frac *= 30.0
            d = int(frac)
            frac -= d
            digits.append(d)
        if rounded and frac != 0.0 and int(frac * 30.0) >= 15:
            i = len(digits) - 1
            while i >= 0 and digits[i] == 29:
                digits[i] = 0
                i -= 1
            if i < 0:
                return None  # carry past the lead digit: renormalizes
            digits[i] += 1
            if i == 0 and digits[0] >= 30:
                return None
        head = _b30_chr(digits[0])
        tail = "".join(_b30_chr(d) for d in digits[1:]).rstrip("0")
        return (
            head + ("." + tail if tail else "") + "-" + _b30_int_str(e)
        )
    int_part = int(a)
    frac = a - int_part
    exponent = 0
    n = int_part
    if n:
        while frac == 0.0 and n % 30 == 0:
            n //= 30
            exponent += 1
    istr = _b30_int_str(n)
    fdigits: list[int] = []
    if frac != 0.0:
        printed = 1 if int_part == 0 else len(istr)
        while frac != 0.0 and printed < budget:
            frac *= 30.0
            d = int(frac)
            frac -= d
            fdigits.append(d)
            printed += 1
        if rounded and frac != 0.0 and int(frac * 30.0) >= 15:
            i = len(fdigits) - 1
            while i >= 0 and fdigits[i] == 29:
                fdigits[i] = 0
                i -= 1
            if i >= 0:
                fdigits[i] += 1
            else:
                istr = _b30_int_str(n + 1)  # carry into the integer
    out = istr
    tail = "".join(_b30_chr(d) for d in fdigits).rstrip("0")
    if tail:
        out += "." + tail
    if exponent > 0:
        out += "+" + _b30_int_str(exponent)
    return out


def _shortest_b30(a: float) -> str:
    """Shortest base-30 token that parses back to `a` bit-for-bit
    under the reader's grammar (sources/por/reader.py _parse_base30).

    Every candidate is VERIFIED through the actual parser before use,
    so this only ever changes token length, never the value. Ladder:

    1. the positional form with a 12/13-digit cut (integers and
       terminating fractions exit here — the parser's left-to-right
       fraction accumulation is only exact when the cut loses
       nothing, so non-terminating fractions rarely verify short);
    2. integer-mantissa × 30^±e ("M-e"/"M+e"): an ≤11-digit mantissa
       parses exactly (float int-accumulation below 2^53) and the
       single 30.0**e multiply is one rounding — candidates M0±1 at
       two scales verify for almost every double, cutting the data
       section ~4× vs the flat PRECISION=50 expansion;
    3. the full exact expansion (always verifies: the fraction terms
       replay the expansion's own digits)."""
    if a == 0.0:
        return "0"
    for budget in (12, 13):
        for rounded in (True, False):
            tok = _render_b30(a, budget, rounded)
            if tok is not None and _parse_base30(tok) == a:
                return tok
    full = _render_b30(a, PRECISION, False)
    err_full = abs(_parse_base30(full) - a)

    x, e = a, 0
    lo, hi = 30.0**10, 30.0**11
    while x < lo:
        x *= 30.0
        e += 1
    while x >= hi:
        x /= 30.0
        e -= 1
    m0 = round(x)
    best_tok, best_err = None, None
    for me in (m0, m0 - 1, m0 + 1, m0 - 2, m0 + 2):
        if me <= 0:
            continue
        if e == 0:
            tok = _b30_int_str(me)
        elif e > 0:
            tok = _b30_int_str(me) + "-" + _b30_int_str(e)
        else:
            tok = _b30_int_str(me) + "+" + _b30_int_str(-e)
        err = abs(_parse_base30(tok) - a)
        if err == 0.0:
            return tok
        if best_err is None or err < best_err:
            best_tok, best_err = tok, err
    if err_full == 0.0:
        # exact long form exists; take the shortest budget that stays
        # exact rather than the short-but-1ulp mantissa form
        for budget in (20, 30):
            tok = _render_b30(a, budget, False)
            if tok is not None and _parse_base30(tok) == a:
                return tok
        return full
    # nothing parses exactly (the reader's fraction accumulation is
    # ~1 ulp lossy for such values — pre-existing format behavior):
    # keep the short mantissa form when it reads back at least as
    # close to the true value as the 50-digit expansion would
    if best_err is not None and best_err <= err_full:
        return best_tok
    return full

def _wrap_write(fh, buf: bytes, pos: int) -> int:
    """Write unwrapped stream bytes starting at column ``pos``,
    inserting CRLF every LINE_LEN columns (one numpy reshape pass per
    chunk instead of the old per-BYTE Python call), and return the
    new column position."""
    import numpy as np

    n = len(buf)
    first = min(LINE_LEN - pos, n)
    head = buf[:first]
    if pos + first < LINE_LEN:
        fh.write(head)
        return pos + first
    rest = buf[first:]
    full = len(rest) // LINE_LEN
    out = bytearray(head)
    out += b"\r\n"
    if full:
        m = np.frombuffer(
            rest[: full * LINE_LEN], dtype=np.uint8
        ).reshape(-1, LINE_LEN)
        o = np.empty((full, LINE_LEN + 2), dtype=np.uint8)
        o[:, :LINE_LEN] = m
        o[:, LINE_LEN] = 13
        o[:, LINE_LEN + 1] = 10
        out += o.tobytes()
    tail = rest[full * LINE_LEN :]
    out += tail
    fh.write(bytes(out))
    return len(tail)


def _por_names(names: list[str]) -> list[str]:
    out, seen = [], set()
    for i, n in enumerate(names):
        base = "".join(c for c in n.upper() if c.isalnum() or c in "@#$_")
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


def write_por(
    df: DataFrame,
    path: str,
    file_label: str = "",
    variable_labels: dict | None = None,
) -> None:
    variable_labels = variable_labels or {}
    fields = df.schema.fields
    names = [f.name for f in fields]
    por_names = _por_names(names)

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
    stats = df.agg(*aggs).collect()[0].asDict()
    widths = [
        max(int(stats.get(f"__w_{f.name}") or 1), 1) if k == "str" else 0
        for f, k in zip(fields, kinds)
    ]

    sel = []
    for f, k in zip(fields, kinds):
        c = F.col(f.name)
        if k == "num":
            sel.append(c.cast("double").alias(f.name))
        elif k == "date":
            sel.append(
                (F.unix_date(c).cast("double") * 86400.0 + float(SPSS_SEC_SHIFT))
                .alias(f.name)
            )
        elif k == "datetime":
            sel.append((ts_epoch_seconds(c) + float(SPSS_SEC_SHIFT)).alias(f.name))
        elif k == "time":
            sel.append((c.cast("double") / 1e9).alias(f.name))
        else:
            sel.append(c.alias(f.name))
    src = df.select(*sel)

    now = datetime.datetime.now()
    from polars_readstat_spark.sources.fs import fs_open_output

    with fs_open_output(path) as fh:
        w = _PorWriter(fh)
        # vanity: 5 × 40 chars; file label surfaces in row 1 cols 20-39
        row0 = "ASCII SPSS PORT FILE".ljust(40)
        row1 = (" " * 20 + file_label[:20]).ljust(40)
        w.write((row0 + row1 + " " * 120)[:200])
        # translation table: position i → ASCII byte for that portable
        # position; '0' for unmapped (identity for ASCII writers)
        table = bytearray(b"0" * 256)
        for pos_, ch in _POS_ASCII.items():
            table[pos_] = ord(ch)
        w.write(bytes(table))
        w.write("SPSSPORT")
        w.write("A")  # version
        w.string(now.strftime("%Y%m%d"))
        w.string(now.strftime("%H%M%S"))
        w.write("1")
        w.string("polars_readstat_spark")
        w.write("4")
        w.b30_int(len(fields))
        w.write("/")
        w.write("5")
        w.b30_int(20)
        w.write("/")
        for i, f in enumerate(fields):
            k = kinds[i]
            w.write("7")
            w.b30_int(widths[i])
            w.write("/")
            w.string(por_names[i])
            if k == "str":
                fmt = (1, min(widths[i], 255), 0)
            elif k == "date":
                fmt = (38, 10, 0)
            elif k == "datetime":
                fmt = (22, 20, 0)
            elif k == "time":
                fmt = (21, 8, 0)
            else:
                fmt = (5, 8, 2)
            for _ in range(2):  # print format then write format
                for x in fmt:
                    w.b30_int(x)
                    w.write("/")
            label = variable_labels.get(f.name) or f.metadata.get("label") or ""
            if label:
                w.write("C")
                w.string(label[:255])
        w.write("F")
        from polars_readstat_spark.writers import (
            iter_packed_chunks,
            iter_packed_chunks_wide,
        )

        kinds_l = list(kinds)
        # the shortest-token ladder dominates big exports: fan it
        # across the cluster (wide protocol) once the pre-pass count
        # says it's worth a shuffle + persist; small writes keep the
        # cheap narrow path
        # wide path: 8192-row chunks so the ladder fans across every
        # core (65536-row chunks capped a 600k-row export at ~10-way);
        # the byte stream is chunk-boundary independent — tokens are
        # per-value and the 80-column wrap tracks a running position
        por_mods = (
            "polars_readstat_spark.writers.por",
            "polars_readstat_spark.sources.por.b30",
        )
        chunks = (
            iter_packed_chunks_wide(
                src, lambda pdf: _pack_por_chunk(pdf, kinds_l), 8192,
                modules=por_mods,
            )
            if int(stats["__n"]) >= 100_000
            else iter_packed_chunks(
                src, lambda pdf: _pack_por_chunk(pdf, kinds_l), 65536,
                modules=por_mods,
            )
        )
        pos = w.pos
        for payload, _n in chunks:
            pos = _wrap_write(fh, payload, pos)
        if pos:  # Z-fill the last line like _PorWriter.finish
            fh.write(b"Z" * (LINE_LEN - pos) + b"\r\n")
