"""SPSS portable (.por) writer — reference W5 re-expressed.

Public spec (PSPP "Portable File Format"): 200-byte vanity header,
256-byte translation table, "SPSSPORT" signature, tagged dictionary
records, base-30 encoded values wrapped at 80-column lines, 'Z'
padding at EOF.

Numbers are written sign + base-30 integer part + '.' fraction (up to
50 base-30 digits) + optional '±exp' (trailing-zero compression for
big integers, normalization for magnitudes < 1/30), '/'-terminated;
'*.' for missing (same grammar our reader parses). Read-back is exact
for short-mantissa values and within ~1 ulp for full-precision
doubles — the reader accumulates digits in rounded float ops, the
same approximation the C readstat/pyreadstat parsers make.

POR is an eager, driver-assembled single file (the format is legacy
interchange, not a data-plane format at scale); rows stream through
`toLocalIterator()` so memory stays bounded.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_readstat_spark.writers import ts_epoch_seconds

from polars_readstat_spark.sources.por.reader import (
    _POS_ASCII,
    SPSS_SEC_SHIFT,
)

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
        a = abs(v)
        if 0.0 < a < 1.0 / 30.0:
            # normalize tiny magnitudes to mantissa × 30^-E: the plain
            # positional form spends its PRECISION budget on leading
            # zeros (a 1e-300 underflowed to literal zero). The reader
            # grammar accepts the trailing -exp just like +exp.
            m, e = a, 0
            while m < 1.0:
                m *= 30.0
                e += 1
            d0 = int(m)
            self.write(chr(ord("0") + d0) if d0 < 10 else chr(ord("A") + d0 - 10))
            frac = m - d0
            if frac != 0.0:
                self.write(".")
                printed = 1
                while frac != 0.0 and printed < PRECISION:
                    frac *= 30.0
                    d = int(frac)
                    frac -= d
                    self.write(
                        chr(ord("0") + d) if d < 10 else chr(ord("A") + d - 10)
                    )
                    printed += 1
            self.write("-")
            self.b30_int(e)
            self.write("/")
            return
        int_part = int(a)
        frac = a - int_part
        exponent = 0
        n = int_part
        if n == 0:
            self.write("0")
        else:
            while frac == 0.0 and n and n % 30 == 0:
                n //= 30
                exponent += 1
            self.b30_int(n)
        if frac != 0.0:
            self.write(".")
            printed = 1 if int_part == 0 else len(self._b30s(int_part))
            while frac != 0.0 and printed < PRECISION:
                frac *= 30.0
                d = int(frac)
                frac -= d
                self.write(
                    chr(ord("0") + d) if d < 10 else chr(ord("A") + d - 10)
                )
                printed += 1
        if exponent > 0:
            self.write("+")
            self.b30_int(exponent)
        self.write("/")

    @staticmethod
    def _b30s(n: int) -> str:
        s = ""
        while n > 0:
            s += "x"
            n //= 30
        return s or "x"

    def string(self, s: str):
        b = s.encode("latin-1", "replace")
        self.b30_int(len(b))
        self.write("/")
        self.write(b)

    def finish(self):
        while self.pos != 0:
            self.byte(ord("Z"))


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
    with open(path, "wb") as fh:
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
        for row in src.toLocalIterator(prefetchPartitions=True):
            for i, k in enumerate(kinds):
                v = row[i]
                if k == "str":
                    w.string(v if v is not None else "")
                else:
                    w.double(v)
        w.finish()
