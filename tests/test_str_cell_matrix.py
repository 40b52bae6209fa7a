"""Byte-identity pins for the shared vectorized string-cell pack
(writers.str_cell_matrix, r13) against the per-row loops it replaced
in the sav/xpt/sas7bdat packers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polars_readstat_spark.writers import str_cell_matrix


def _ref_plain(col, w):
    """The old sav/sas7bdat per-row loop: utf-8, byte-truncate, space
    pad (sas wrote only len(b) bytes over a space-prefilled slice —
    same matrix)."""
    m = np.full((len(col), w), 0x20, np.uint8)
    for ri, s in enumerate(col):
        b = (s if isinstance(s, str) else "").encode("utf-8")[:w]
        if b:
            m[ri, : len(b)] = np.frombuffer(b, np.uint8)
    return m


def _ref_xpt(col, w):
    """The old xpt loop: utf-8, truncate backed off to a character
    boundary, space pad."""
    m = np.full((len(col), w), 0x20, np.uint8)
    for ri, s in enumerate(col):
        full = (s if isinstance(s, str) else "").encode("utf-8")
        b = full[:w]
        if len(b) < len(full):
            for _ in range(3):
                try:
                    b.decode("utf-8")
                    break
                except UnicodeDecodeError:
                    b = b[:-1]
        m[ri] = np.frombuffer(b.ljust(w), np.uint8)
    return m


_CASES = pd.Series(
    [
        "", "a", None, "héllo wörld", "日本語テキスト", "x" * 64,
        "exact", "ab\x01c", "trail  ", "日本", float("nan"),
        "a" * 7 + "é", "🎉🎊🎈", " lead", "\t\n",
    ],
    dtype=object,
)


@pytest.mark.parametrize("w", [1, 2, 5, 8, 16, 64])
def test_identical_to_plain_loop(w):
    assert (str_cell_matrix(_CASES, w) == _ref_plain(_CASES, w)).all()


@pytest.mark.parametrize("w", [1, 2, 5, 8, 16, 64])
def test_identical_to_xpt_loop(w):
    assert (
        str_cell_matrix(_CASES, w, utf8_boundary=True) == _ref_xpt(_CASES, w)
    ).all()


def test_fuzz_mixed_pool():
    import random

    random.seed(20260817)
    pool = [
        "", "a", "bb", "日本語", "héllo", None, "x" * 30, "🎉",
        "mixed 日本 text", "trail ", "\t\n", "é" * 20,
    ]
    col = pd.Series([random.choice(pool) for _ in range(4000)], dtype=object)
    for w in (1, 4, 9, 30):
        assert (str_cell_matrix(col, w) == _ref_plain(col, w)).all()
        assert (
            str_cell_matrix(col, w, utf8_boundary=True) == _ref_xpt(col, w)
        ).all()


def test_edges():
    assert (str_cell_matrix(pd.Series([None, None], dtype=object), 3) == 0x20).all()
    assert str_cell_matrix(pd.Series([], dtype=object), 3).shape == (0, 3)
    # tuple/list inputs (driver toLocalIterator path)
    got = str_cell_matrix(["a", None, "bc"], 4)
    ref = _ref_plain(pd.Series(["a", None, "bc"], dtype=object), 4)
    assert (got == ref).all()
