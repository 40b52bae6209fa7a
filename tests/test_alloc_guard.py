"""The hugepage-madvise guard: default-off with an explicit escape
hatch (see _alloc.py for the 9.5s-vs-0.58s cold-decode measurement
that motivates it)."""

from __future__ import annotations

import importlib
import os

import pytest


def _toggle_state() -> bool:
    for mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
        try:
            ma = importlib.import_module(mod)
            return bool(ma._get_madvise_hugepage())
        except Exception:  # noqa: BLE001
            continue
    pytest.skip("numpy madvise toggle API unavailable")


def test_disable_flips_numpy_toggle(monkeypatch):
    from polars_readstat_spark import _alloc

    monkeypatch.delenv("PRS_KEEP_HUGEPAGE", raising=False)
    _alloc.disable_hugepage_madvise()
    assert _toggle_state() is False
    assert os.environ.get("NUMPY_MADVISE_HUGEPAGE") == "0"


def test_escape_hatch_keeps_hugepages(monkeypatch):
    from polars_readstat_spark import _alloc

    for mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
        try:
            ma = importlib.import_module(mod)
            ma._set_madvise_hugepage(True)
            break
        except Exception:  # noqa: BLE001
            continue
    monkeypatch.setenv("PRS_KEEP_HUGEPAGE", "1")
    _alloc.disable_hugepage_madvise()
    assert _toggle_state() is True
    # restore the package default for the rest of the session
    monkeypatch.delenv("PRS_KEEP_HUGEPAGE")
    _alloc.disable_hugepage_madvise()
    assert _toggle_state() is False
