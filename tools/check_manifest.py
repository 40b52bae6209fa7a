"""Validate a _prs_stats.json zone-map manifest against its directory.

Usage:
  python tools/check_manifest.py DIR [--verify-values]

Checks per entry (hard failures exit 1):
  - the file exists and is a supported data file
  - size (and mtime when recorded) match the live file — mismatches
    are reported as STALE (the reader already degrades those to
    no-skip, so stale is a warning, not a failure)
  - row count `n` matches the file's own header row count
  - stripe geometry: rows > 0 and len(cols) == ceil(n / rows)
  - per-column shape: min <= max when both present, 0 <= nn <= n,
    date-tagged entries carry integer day bounds

--verify-values additionally re-reads every file through the real
reader chain, recomputes file-level stats with the same accumulator
the sink uses, and diffs published min/max/nn against the recomputed
truth — the expensive ground-truth pass (one full read per file).
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _header_row_count(path: str) -> int | None:
    """Row count from the file's own metadata (header-only parse)."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    try:
        if ext == "dta":
            from polars_readstat_spark.sources.dta.meta import parse_dta_meta

            return parse_dta_meta(path).nobs
        if ext == "sas7bdat":
            from polars_readstat_spark.sources.sas7bdat.meta import (
                parse_sas_meta,
            )

            return parse_sas_meta(path).row_count
        if ext in ("sav", "zsav"):
            from polars_readstat_spark.sources.sav.meta import parse_sav_meta

            m = parse_sav_meta(path)
            n = m.nobs
            return n if n and n > 0 else None  # -1 = unknown in header
        if ext == "xpt":
            from polars_readstat_spark.sources.xpt.meta import parse_xpt_meta

            return parse_xpt_meta(path).nobs
    except Exception:  # noqa: BLE001 — unreadable header: reported
        return None
    return None  # por: row count only knowable by full decode


def _check_cols(name: str, cols: dict, n: int, problems: list) -> None:
    for col, e in cols.items():
        if not isinstance(e, dict):
            problems.append(f"{name}: column {col!r} entry not a dict")
            continue
        mn, mx, nn, cn = (
            e.get("min"), e.get("max"), e.get("nn"), e.get("n"),
        )
        if e.get("t") == "date":
            for v, lbl in ((mn, "min"), (mx, "max")):
                if v is not None and (
                    not isinstance(v, int) or isinstance(v, bool)
                ):
                    problems.append(
                        f"{name}.{col}: date {lbl} not integer days"
                    )
        if (
            mn is not None
            and mx is not None
            and type(mn) is type(mx)
            and mn > mx
        ):
            problems.append(f"{name}.{col}: min > max ({mn!r} > {mx!r})")
        if not isinstance(nn, int) or not isinstance(cn, int):
            problems.append(f"{name}.{col}: missing nn/n accounting")
        elif not (0 <= nn <= cn):
            problems.append(f"{name}.{col}: nn/n out of range ({nn}/{cn})")
        elif n is not None and cn > n:
            problems.append(
                f"{name}.{col}: column n {cn} exceeds entry rows {n}"
            )
        bf = e.get("bf")
        if bf is not None:
            from polars_readstat_spark.sources.bloom import bloom_valid

            if not bloom_valid(bf):
                problems.append(
                    f"{name}.{col}: bloom fragment malformed "
                    "(the reader ignores it — no refutation risk, "
                    "but it is dead manifest weight)"
                )
            else:
                import base64

                try:
                    raw = base64.b64decode(bf["b"], validate=True)
                except Exception:  # noqa: BLE001
                    raw = b""
                if len(raw) * 8 != bf["m"]:
                    problems.append(
                        f"{name}.{col}: bloom bits length "
                        f"{len(raw) * 8} != m {bf['m']}"
                    )


def check_manifest(dir_path: str, verify_values: bool = False):
    from polars_readstat_spark.sources import fs as _fs

    mpath = _fs.fs_join(dir_path, "_prs_stats.json")
    with _fs.fs_open(mpath) as f:
        doc = json.loads(f.read())
    files = doc.get("files", {})
    problems: list[str] = []
    stale: list[str] = []
    for base, e in sorted(files.items()):
        path = _fs.fs_join(dir_path, base)
        try:
            size, mtime_ns = _fs.fs_stat(path)
        except OSError:
            stale.append(f"{base}: file missing (entry is inert)")
            continue
        if size != e.get("size") or (
            e.get("mtime_ns") is not None
            and mtime_ns != e.get("mtime_ns")
        ):
            stale.append(f"{base}: size/mtime drifted (entry is inert)")
            continue
        n = e.get("n")
        hdr = _header_row_count(path)
        if hdr is not None and isinstance(n, int) and hdr != n:
            problems.append(
                f"{base}: manifest n={n} but header says {hdr}"
            )
        _check_cols(base, e.get("cols", {}) or {}, n, problems)
        st = e.get("stripes")
        if st is not None:
            r, arr = st.get("rows"), st.get("cols")
            if not isinstance(r, int) or r <= 0:
                problems.append(f"{base}: stripe rows invalid ({r!r})")
            elif not isinstance(arr, list):
                problems.append(f"{base}: stripe cols not a list")
            else:
                if isinstance(n, int) and len(arr) != math.ceil(n / r):
                    problems.append(
                        f"{base}: {len(arr)} stripes != ceil({n}/{r})"
                    )
                for i, cols in enumerate(arr):
                    if isinstance(cols, dict):
                        hi = min(n, (i + 1) * r) if isinstance(n, int) else None
                        span = (hi - i * r) if hi is not None else None
                        _check_cols(
                            f"{base}[stripe{i}]", cols, span, problems
                        )
        if verify_values:
            problems.extend(_verify_values(path, base, e))
    return problems, stale, len(files)


def _verify_values(path: str, base: str, entry: dict) -> list[str]:
    """Ground truth: re-read the file, recompute file-level stats with
    the sink's accumulator, diff published values."""
    from polars_readstat_spark.sources.datasource import ReadstatDataSource
    from polars_readstat_spark.sources.zonemap_index import _kinds_for
    from polars_readstat_spark.writers.spark_sink import (
        ZoneMapStats,
        _publishable_cols,
    )

    out: list[str] = []
    try:
        ds = ReadstatDataSource({"path": path})
        schema = ds._schema_uncompressed()
        reader = ds._reader_uncompressed(schema)
        pairs = _kinds_for(schema)
        bloom_cols = tuple(
            c
            for c, e in (entry.get("cols") or {}).items()
            if isinstance(e, dict) and "bf" in e
        )
        acc = ZoneMapStats(
            [nm for nm, _ in pairs],
            [k for _, k in pairs],
            "",
            bloom_cols=bloom_cols,
            # unbounded re-derivation: the goal is the exact canon
            # set, not a publishable payload
            bloom_max_bytes=1 << 30,
        )
        for part in reader.partitions():
            for batch in reader.read(part):
                acc.add(batch)
    except Exception as e:  # noqa: BLE001
        return [f"{base}: verify read failed: {e!r}"]
    truth = _publishable_cols(acc.stats)
    for col, pub in (entry.get("cols") or {}).items():
        bf = pub.get("bf") if isinstance(pub, dict) else None
        bl = acc.bloom.get(col) if isinstance(bf, dict) else None
        if bl is not None and not bl.dropped:
            # the false-NEGATIVE check: every canon value the reader
            # actually outputs must test maybe-present in the
            # published bloom, or a point predicate could drop rows
            from polars_readstat_spark.sources.bloom import bloom_absent

            probe = dict(bf)  # keep the entry's memo untouched
            missing = sum(
                1 for x in bl.seen if bloom_absent(probe, x)
            )
            if missing:
                out.append(
                    f"{base}.{col}: bloom MISSES {missing} live "
                    "values (false-negative capable — unsound)"
                )
        t = truth.get(col)
        if t is None:
            # published but truth says unpublishable (e.g. the
            # fix-point rules poison it reader-side too): a WRITER
            # manifest may legitimately publish what reader-side
            # rules would poison only if values agree — flag softly
            out.append(
                f"{base}.{col}: published but recomputation deems "
                "unpublishable"
            )
            continue
        for k in ("min", "max"):
            if pub.get(k) != t.get(k):
                out.append(
                    f"{base}.{col}: {k} {pub.get(k)!r} != recomputed "
                    f"{t.get(k)!r}"
                )
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--verify-values", action="store_true")
    args = ap.parse_args()
    problems, stale, total = check_manifest(args.dir, args.verify_values)
    for s in stale:
        print(f"STALE  {s}")
    for p in problems:
        print(f"FAIL   {p}")
    print(
        f"{total} entries checked: {len(problems)} problems, "
        f"{len(stale)} stale"
    )
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
