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


def test_total_excludes_nparts_probes():
    """The *_nparts plan probes record partition COUNTS, not seconds —
    BENCH_r07's headline summed them (545.5 reported vs 185.5 true,
    VERDICT r07 wrong#1). The total must count second-valued entries
    only, and a failed probe must not appear in `errors`."""
    timings = {
        "read_zsav_acs_full": 1.2,
        "read_zsav_acs_full_nparts": 32,
        "read_dta_10m_full": 0.3,
        "read_dta_10m_full_nparts": 40,
        "broken_query": -1.0,
        "broken_probe_nparts": -1.0,
    }
    total, errors = bench._total_and_errors(timings)
    assert total == 1.5
    assert errors == ["broken_query"]


def test_nparts_probes_sorted_out_of_headline_surface():
    """Probes rank below the BASELINE read surface in the stdout line
    so truncation drops them first."""
    p = _payload(n_extra=0)
    p["queries"]["read_zsav_acs_full_nparts"] = 32
    order = sorted(p["queries"], key=bench._headline_priority)
    assert order[-1].endswith("_nparts") or bench._headline_priority(
        "read_zsav_acs_full_nparts"
    )[0] > bench._headline_priority("read_zsav_acs_full")[0]


# ── retry-tier policy (the measurement-integrity machinery) ──────────


def test_abs_bar_families():
    """Per-family absolute bars: tight on the plain read quartet,
    loose on the genuinely-heavy families, so the tier re-times
    stalls without re-running honest heavy work every sweep."""
    assert bench._abs_bar("read_dta_full") == 0.9
    # zsav/wide/100m/bytecode reads wall 1.1-2.5 s genuinely
    assert bench._abs_bar("read_zsav_acs_full") == 2.5
    assert bench._abs_bar("read_sav_wide_full") == 2.5
    assert bench._abs_bar("read_dta_100m_10files") == 2.5
    assert bench._abs_bar("read_sav_acs_bytecode_full") == 2.5
    assert bench._abs_bar("export_sas7bdat_rle") == 6.0
    assert bench._abs_bar("floor_dedup_scale10x") == 8.0
    # streaming drains pay a fixed per-micro-batch floor
    assert bench._abs_bar("stream_sessionize_stateful") == 8.0
    assert bench._abs_bar("q1_pricing_summary") == 2.5


def test_needs_retry_ratio_trigger():
    """>2x-vs-previous-committed fires only above the 0.4 s floor and
    when the previous value is a real measurement (>0.15 s)."""
    prev = {"a": 0.5, "b": 0.1, "c": 0.3}
    assert bench._needs_retry("a", 1.2, prev)  # 2.4x prior, above floor
    assert not bench._needs_retry("a", 0.9, prev)  # <2x
    assert not bench._needs_retry("b", 0.3, prev)  # prior too small
    # 2x prior but under the 0.4 s noise floor
    assert not bench._needs_retry("c", 0.39, prev)
    # absolute bar fires with no prior at all
    assert bench._needs_retry("read_dta_full", 1.0, {})
    assert not bench._needs_retry("read_dta_full", 0.5, {})


def test_retry_pairs_direction():
    """Every A/B pair is (slow_arm, fast_arm): the tier re-times both
    when the supposedly-slow arm records <= the fast arm. Pin the
    direction for the two non-latency pairs, where the naming isn't
    self-evident: 10x volume must out-wall 1x, and a 4-micro-batch
    drain must out-wall the same drain in one batch."""
    pairs = dict(bench._RETRY_PAIRS)
    assert pairs["floor_dedup_scale10x"] == "floor_dedup_scale1x"
    assert pairs["floor_stream_4batch"] == "floor_stream_1batch"
    for slow, fast in bench._RETRY_PAIRS:
        # latency pairs: serial arm is the slow one by construction
        if "serial" in slow:
            assert "serial" not in fast
