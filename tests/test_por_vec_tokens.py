"""Byte-identity pins for the vectorized POR token pipeline (r13).

_num_tokens_unique / _pack_por_chunk replay the scalar ladder's exact
IEEE-754 operation sequences lane-wise in numpy, so every token must
be byte-identical to _num_token's — across the integer fast path,
rung-1 positional cuts (rounded and not), rung-2 mantissa candidates,
the rung-3 best-err/full-expansion split, and the scalar-fallback
domain (±inf, 0<|v|<1/30, |v|≥30^11, subnormals).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polars_readstat_spark.writers.por import (
    _POR_SAFE,
    _b30_int_str,
    _num_token,
    _num_tokens_unique,
    _pack_por_chunk,
)


def _vec_tokens(vals):
    u = np.asarray(vals, dtype=np.float64)
    tm, tl = _num_tokens_unique(u)
    return [tm[i, : tl[i]].tobytes().decode("latin-1") for i in range(len(u))]


def _assert_identical(vals, label):
    got = _vec_tokens(vals)
    for v, g in zip(vals, got):
        w = _num_token(float(v))
        assert g == w, f"{label}: v={v!r} vec={g!r} scalar={w!r}"


B30_11 = 30.0**11


@pytest.mark.parametrize(
    "label,vals",
    [
        (
            "edges",
            [
                0.0, -0.0, float("inf"), float("-inf"),
                1 / 30, np.nextafter(1 / 30, 0), np.nextafter(1 / 30, 1),
                B30_11, np.nextafter(B30_11, 0), np.nextafter(B30_11, np.inf),
                30.0**10, np.nextafter(30.0**10, 0),
                5e-324, 1e-310, 1e308, 0.5, 0.25, 1 / 3, 2 / 3,
                2.0**53, 2.0**53 - 1, -(2.0**53), 29.0, 30.0, 31.0,
                899.0, 900.0, 0.1, -0.1, 1e-5, -1e-5,
            ],
        ),
        ("money", [round(c / 100.0, 2) for c in range(0, 200000, 7)]),
        ("negmoney", [-round(c / 100.0, 2) for c in range(1, 100000, 11)]),
    ],
)
def test_token_identity_pinned(label, vals):
    _assert_identical(vals, label)


def test_token_identity_fuzz():
    rng = np.random.default_rng(20260817)
    _assert_identical(
        rng.standard_normal(5000) * np.exp(rng.uniform(-25, 25, 5000)),
        "lognormal",
    )
    _assert_identical(
        rng.integers(-(10**15), 10**15, 5000).astype(float), "bigint"
    )
    _assert_identical(rng.uniform(0, 2, 5000), "unit")
    _assert_identical(rng.standard_normal(2000) * 1e-6, "tiny")
    # dyadics: exactly-terminating base-30 expansions of many lengths
    _assert_identical(
        [np.ldexp(m, -s) for m in (1, 3, 5, 255) for s in range(1, 40)],
        "dyadic",
    )


def _pack_reference(pdf, kinds) -> bytes:
    """The pre-r13 scalar pack, kept as the semantic reference."""
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
            cells = []
            for v in s.tolist():
                if v is None or v != v:
                    cells.append("*.")
                else:
                    cells.append(_num_token(v))
            cols.append(cells)
    parts = []
    for r in range(len(pdf)):
        for c in cols:
            parts.append(c[r])
    return "".join(parts).encode("latin-1", "replace")


def test_pack_chunk_bytes_identical():
    rng = np.random.default_rng(7)
    n = 700
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 10**9, n).astype(float),
            "price": np.round(rng.uniform(0, 1e5, n), 2),
            "x": rng.standard_normal(n) * np.exp(rng.uniform(-15, 15, n)),
            "s": pd.Series(
                ["", "a", "héllo", None, "x" * 40, "tab\there"] * (n // 6)
                + [""] * (n % 6),
                dtype=object,
            ),
        }
    )
    pdf.loc[3:40:7, "price"] = np.nan
    pdf.loc[5:60:11, "x"] = np.nan
    kinds = ["num", "num", "num", "str"]
    assert _pack_por_chunk(pdf, kinds) == _pack_reference(pdf, kinds)


def test_pack_chunk_all_null_columns():
    pdf = pd.DataFrame(
        {
            "x": pd.Series([np.nan, np.nan, np.nan], dtype=np.float64),
            "s": pd.Series([None, None, None], dtype=object),
        }
    )
    kinds = ["num", "str"]
    assert _pack_por_chunk(pdf, kinds) == _pack_reference(pdf, kinds)


def test_pack_chunk_empty():
    pdf = pd.DataFrame({"x": pd.Series([], dtype=np.float64)})
    assert _pack_por_chunk(pdf, ["num"]) == b""
