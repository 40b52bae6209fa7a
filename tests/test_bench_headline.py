"""The bench stdout line must stay inside the driver's ~2 KB stdout
tail: rounds 2-6 recorded parsed=null because the full query dict
(~5.7 KB) truncated mid-JSON. These tests pin the size bound and the
priority order so the BASELINE read surface always makes the line."""

from __future__ import annotations

import json

import bench


def _payload(n_extra: int = 150):
    q = {}
    for ext in ("dta", "sas7bdat", "sav", "xpt"):
        for v in ("full", "subset", "filter", "subset_filter"):
            q[f"read_{ext}_{v}"] = 0.123
    for name in (
        "read_sas7bdat_acs_full",
        "read_zsav_acs_full",
        "read_sav_acs_bytecode_full",
        "read_sav_wide_full",
        "read_dta_10m_full",
        "read_dta_100m_10files",
        "read_por_8files",
        "floor_16task_1row",
        "floor_noop_source_10m7",
    ):
        q[name] = 1.234
    for i in range(8):
        q[f"export_format_variant_{i}"] = 2.345
    for i in range(n_extra):
        q[f"some_registry_query_with_a_long_name_{i:03d}"] = 0.456
    return {
        "metric": "total_query_runtime",
        "value": 500.0,
        "unit": "sec",
        "wall_s": 600.0,
        "errors": [],
        "queries": q,
        "sf": 0.1,
    }


def test_headline_line_fits_driver_tail():
    line = bench._headline_line(_payload())
    assert len(line) <= 1900  # < 2000-char tail with margin
    d = json.loads(line)
    assert d["n_timed"] == len(_payload()["queries"])
    assert d["bench_full"] == "BENCH.json"


def test_headline_keeps_baseline_surface_first():
    d = json.loads(bench._headline_line(_payload()))
    kept = d["queries"]
    # every read/export/floor entry survives truncation
    for k in _payload()["queries"]:
        if k.startswith(("read_", "export_", "floor_")):
            assert k in kept, k
    # filler got truncated, proving the budget bound engaged
    assert len(kept) < d["n_timed"]


def test_headline_small_payload_is_complete():
    p = _payload(n_extra=0)
    d = json.loads(bench._headline_line(p))
    assert set(d["queries"]) == set(p["queries"])
