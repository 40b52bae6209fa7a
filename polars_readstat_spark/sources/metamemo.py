"""In-process memo for parsed file metadata, keyed (kind, abspath,
mtime_ns, size).

Every ``spark.read.format("readstat")`` plan parses the file's header
and column metadata; on a wide file that parse walks real data (the
ACS-shape sas7bdat: 0.85 s cold, ~3 ms page-cache-warm, plus ~50 ms of
page-header prescan for partition planning). Spark reuses its Python
plan/exec workers (``spark.python.worker.reuse`` default true), so a
process-level memo turns repeated reads of the same file — the
interactive and dashboard pattern — into dictionary hits. The key
invalidates on any rewrite (writers publish via os.replace, which
bumps both identity fields); memory is bounded by a crude clear-at-cap
(metadata objects are small, files-per-process is small).

Only the PARSE is memoized — consumers never mutate meta objects
(verified: all attribute writes happen inside the parse functions).
List-valued parses (SasReader._scan_page_rows) are additionally
frozen to tuples at store time (ADVICE r09): the memo hands every
caller the same object, so a future consumer that clipped or sorted
the list in place would silently corrupt all later readers of the
same file — a tuple turns that bug into an immediate TypeError.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Callable

_MEMO: dict[tuple, Any] = {}
# sized ABOVE the biggest directory the bench plans (5k files) AT
# the worst entries-per-file ratio — sas7bdat planning stores up to
# THREE entries per file (meta + page_rows + has_mix), so a cap
# counted in files would FIFO-thrash on a big sas7bdat directory
# re-plan (each miss evicting the next key the pass needs, 100%
# miss). Parsed metas are ~1 KB each (~24 MB at cap, bounded per
# worker process; the rare big page_rows tuples are few per dir).
_MAX_ENTRIES = 3 * 8192
# eviction+insert only — parse() runs unlocked (it can be slow, and
# planning is concurrent since the r10 chunked-thread header parses;
# two threads racing the unlocked evict could double-pop or hit
# 'dict changed size during iteration')
_LOCK = threading.Lock()


def memoized_parse(kind: str, path: str, parse: Callable[[str], Any]) -> Any:
    from polars_readstat_spark.sources.fs import fs_stat, path_scheme

    try:
        size, mtime = fs_stat(path)  # one round trip, fs-seam aware
    except OSError:
        return parse(path)  # let the parser raise its own error
    ident = path if path_scheme(path) else os.path.abspath(path)
    key = (kind, ident, mtime, size)
    hit = _MEMO.get(key)
    if hit is None:
        hit = _sidecar_load(kind, ident, mtime, size, parse)
        if hit is None:
            import time as _time

            t0 = _time.perf_counter()
            hit = parse(path)
            parse_wall = _time.perf_counter() - t0
            if isinstance(hit, list):
                hit = tuple(hit)  # freeze: shared across all callers
            # persist only parses worth persisting: the store path
            # (fingerprint + pickle + atomic publish) costs ~0.25 ms,
            # so a skinny local dta header (~0.06 ms) would pay 4x its
            # own parse to cache — a 5k-dir first plan would regress
            # 0.35 s → ~2 s. Anything ≥ the threshold (wide metas,
            # sas page prescans, every remote parse whose wall
            # includes first-byte latency) amortizes in one reuse.
            if parse_wall >= _PERSIST_MIN_S:
                _sidecar_store(kind, ident, mtime, size, parse, hit)
        with _LOCK:
            # evict ONE entry (FIFO — dicts iterate in insertion
            # order) instead of clearing: a big directory scan
            # crossing the cap would otherwise drop every hot header
            # at once and re-parse the whole working set
            if len(_MEMO) >= _MAX_ENTRIES:
                _MEMO.pop(next(iter(_MEMO)), None)
            _MEMO[key] = hit
    return hit


# ── persistent sidecar layer (VERDICT r10 next#6) ────────────────────
# The in-process memo dies with the driver, so every NEW session
# re-parses every header — ~0.4 s per 5k local files, but
# files × first-byte-latency on a remote store, and ~0.85 s for ONE
# cold wide sas7bdat. Parsed metadata is pure file geometry, so it
# persists as a pickle sidecar in the per-uid 0700 cache dir (the
# zsav checkpoint-index pattern: ownership-checked reads, atomic
# writes, content fingerprint re-verify). Invalidation:
#   * (mtime_ns, size) in the sidecar name — any rewrite re-parses;
#   * the parser module's own (size, mtime) stamp — a code change
#     drops every sidecar it wrote;
#   * for local files, cache.content_fingerprint closes the
#     same-size-same-tick rewrite window (remote paths rely on
#     (size, mtime): object stores don't rewrite in place).
# Unpicklable results simply skip persistence — the sidecar is an
# optimization, never required.

_SIDE_FMT = 2  # sidecar payload layout version
_PERSIST_MIN_S = 0.002  # parses cheaper than this re-parse instead


_PKG_STAMP: str | None = None


def _package_stamp() -> str:
    """(size, mtime) digest over EVERY module in sources/ — parse
    functions call into shared helpers (strdecode, page/meta utils,
    the fs seam), so stamping only the parse function's own module
    left stale sidecars serving old results after a helper-only
    change (ADVICE r11). Over-invalidation is the safe direction: any
    sources/ edit drops all sidecars, which rebuild lazily. Computed
    once per process (~1 ms)."""
    global _PKG_STAMP
    if _PKG_STAMP is None:
        import hashlib

        root = os.path.dirname(os.path.abspath(__file__))
        h = hashlib.sha1()
        try:
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = sorted(
                    d for d in dirnames if d != "__pycache__"
                )
                for f in sorted(filenames):
                    if not f.endswith(".py"):
                        continue
                    try:
                        st = os.stat(os.path.join(dirpath, f))
                        h.update(
                            f"{f}|{st.st_size}|{st.st_mtime_ns};".encode()
                        )
                    except OSError:
                        h.update(f"{f}|gone;".encode())
        except OSError:
            return "nocode"
        _PKG_STAMP = h.hexdigest()[:16]
    return _PKG_STAMP


def _code_stamp(parse: Callable) -> str:
    import sys

    mod = sys.modules.get(getattr(parse, "__module__", ""), None)
    f = getattr(mod, "__file__", None)
    if not f:
        return "nocode"
    try:
        st = os.stat(f)
        return f"{st.st_size}.{st.st_mtime_ns}.{_package_stamp()}"
    except OSError:
        return "nocode"


def _sidecar_file(kind: str, ident: str, mtime: int, size: int):
    import hashlib

    from polars_readstat_spark.sources import cache

    h = hashlib.sha1(
        f"{_SIDE_FMT}|{kind}|{ident}|{mtime}|{size}".encode()
    ).hexdigest()[:24]
    return cache.cache_path(f"prs-metamemo-{h}.pkl")


def _fingerprint(ident: str) -> str | None:
    from polars_readstat_spark.sources import cache
    from polars_readstat_spark.sources.fs import path_scheme

    if path_scheme(ident):
        return None  # remote: (size, mtime) identity only
    try:
        return cache.content_fingerprint(ident)
    except OSError:
        return None


def _sidecar_load(
    kind: str, ident: str, mtime: int, size: int, parse: Callable
) -> Any:
    import pickle

    from polars_readstat_spark.sources import cache

    p = _sidecar_file(kind, ident, mtime, size)
    if p is None:
        return None
    raw = cache.read_trusted(p)
    if raw is None:
        return None
    try:
        obj = pickle.loads(raw)
    except Exception:  # noqa: BLE001 — corrupt/foreign sidecar: re-parse
        return None
    if not isinstance(obj, dict) or obj.get("code") != _code_stamp(parse):
        return None
    if obj.get("fp") != _fingerprint(ident):
        return None
    return obj.get("value")


def _sidecar_store(
    kind: str,
    ident: str,
    mtime: int,
    size: int,
    parse: Callable,
    value: Any,
) -> None:
    import pickle

    from polars_readstat_spark.sources import cache

    p = _sidecar_file(kind, ident, mtime, size)
    if p is None:
        return
    try:
        raw = pickle.dumps(
            {
                "code": _code_stamp(parse),
                "fp": _fingerprint(ident),
                "value": value,
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )
    except Exception:  # noqa: BLE001 — unpicklable result: skip
        return
    cache.write_atomic(p, raw)
