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
        hit = parse(path)
        if isinstance(hit, list):
            hit = tuple(hit)  # freeze: shared across all callers
        with _LOCK:
            # evict ONE entry (FIFO — dicts iterate in insertion
            # order) instead of clearing: a big directory scan
            # crossing the cap would otherwise drop every hot header
            # at once and re-parse the whole working set
            if len(_MEMO) >= _MAX_ENTRIES:
                _MEMO.pop(next(iter(_MEMO)), None)
            _MEMO[key] = hit
    return hit
