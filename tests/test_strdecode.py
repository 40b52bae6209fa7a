"""Unit tests for the vectorized fixed-width string decode
(sources/strdecode.py): trim semantics must be bit-identical to the
per-value slow paths, and every unsafe shape must decline to the
caller's fallback."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from polars_readstat_spark.sources import strdecode as sd


def _mat(rows: list[bytes], w: int) -> np.ndarray:
    return np.frombuffer(
        b"".join(r.ljust(w, b"\0") for r in rows), dtype=np.uint8
    ).reshape(len(rows), w).copy()


def test_lengths_first_nul():
    m = _mat([b"abc\0x", b"abcde", b"\0rest", b""], 5)
    assert sd.lengths_first_nul(m).tolist() == [3, 5, 0, 0]


def test_lengths_rstrip():
    m = _mat([b"ab  ", b"ab\0 ", b"    ", b"a b "], 4)
    assert sd.lengths_rstrip(m).tolist() == [2, 2, 0, 3]


def test_vectorized_ascii_roundtrip():
    rows = [b"hello", b"", b"a c", b"xy"]
    m = _mat(rows, 6)
    arr = sd.try_vectorized(m, sd.lengths_first_nul(m), "utf-8")
    assert arr.to_pylist() == ["hello", "", "a c", "xy"]


def test_vectorized_matches_slow_path_dta_semantics():
    # stop-at-first-NUL: bytes after an interior NUL are dropped
    rows = [b"ab\0cd", b"abcde"]
    m = _mat(rows, 5)
    arr = sd.try_vectorized(m, sd.lengths_first_nul(m), "latin-1")
    assert arr.to_pylist() == ["ab", "abcde"]


def test_utf8_multibyte_accepted():
    s = "héllo".encode()
    m = _mat([s, b"plain"], 8)
    arr = sd.try_vectorized(m, sd.lengths_first_nul(m), "utf-8")
    assert arr.to_pylist() == ["héllo", "plain"]


def test_invalid_utf8_declines():
    m = _mat([b"\xff\xfe!", b"ok"], 4)
    assert sd.try_vectorized(m, sd.lengths_first_nul(m), "utf-8") is None


def test_high_bytes_non_utf8_declines():
    m = _mat([b"caf\xe9"], 4)  # latin-1 é
    assert sd.try_vectorized(m, sd.lengths_first_nul(m), "latin-1") is None


def test_non_ascii_compatible_encoding_declines():
    m = _mat([b"abc"], 3)
    assert sd.try_vectorized(m, sd.lengths_first_nul(m), "cp500") is None


def test_empty_to_null():
    arr = pa.array(["a", "", "b"])
    assert sd.empty_to_null(arr).to_pylist() == ["a", None, "b"]


def test_map_int_labels():
    codes = np.array([1, 2, 3, 1, 99], dtype=np.int64)
    mask = np.array([False, False, True, False, False])
    out = sd.map_int_labels(codes, mask, {1: "one", 2: "two"})
    assert out.to_pylist() == ["one", "two", None, "one", "99"]


def test_map_via_unique_float_render():
    vals = np.array([1.0, 2.5, 1.0], dtype=np.float64)
    mask = np.zeros(3, dtype=bool)
    out = sd.map_via_unique(
        vals, mask, lambda v: str(int(v)) if float(v).is_integer() else str(v)
    )
    assert out.to_pylist() == ["1", "2.5", "1"]


def test_sav_slow_path_gates():
    """SAV-specific gates: interior NUL and trailing control whitespace
    decline so the unicode-rstrip slow path handles them."""
    from polars_readstat_spark.sources.sav.decode import (
        _decode_string_vectorized,
    )

    class FakeMeta:
        encoding = "utf-8"

    ok = _decode_string_vectorized(_mat([b"ab  ", b"cd  "], 4), 4, FakeMeta)
    assert ok.to_pylist() == ["ab", "cd"]
    # interior NUL → slow path (it strips them)
    assert _decode_string_vectorized(_mat([b"a\0b "], 4), 4, FakeMeta) is None
    # trailing tab → slow path (unicode rstrip strips it)
    assert _decode_string_vectorized(_mat([b"ab\t "], 4), 4, FakeMeta) is None


def test_map_str_labels_edge_semantics():
    """vl.get(s, s) parity (advice r12): a None label value maps the
    matched key to NULL (not the literal 'None'); a non-str label key
    is silently ignored; unlabeled values pass through; nulls stay
    null."""
    import pyarrow as pa

    arr = pa.array(["a", "b", "c", None], type=pa.string())
    out = sd.map_str_labels(arr, {"a": "Alpha", "b": None, 7: "seven"})
    assert out.to_pylist() == ["Alpha", None, "c", None]


def test_map_str_labels_empty_after_filter():
    import pyarrow as pa

    arr = pa.array(["x", None], type=pa.string())
    out = sd.map_str_labels(arr, {3: "three"})
    assert out.to_pylist() == ["x", None]
