"""Scalar base-30 ("trigesimal") token parser for SPSS portable files.

Kept free of package-internal imports so executor-side code (the POR
writer's pack stage pickles by value) can carry it without shipping
the whole package: the reader's vectorized paths, its scalar fallback,
and the writer's shortest-token verification all share these exact
operation sequences (public PSPP "Portable File Format" spec)."""

from __future__ import annotations


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
