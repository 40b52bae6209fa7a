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
from typing import Any, Callable

_MEMO: dict[tuple, Any] = {}
# sized for big-directory planning: a 5k-file scan re-planned in the
# same process should hit the memo, and parsed metas are ~1 KB each
# (~4 MB at cap — bounded per worker process)
_MAX_ENTRIES = 4096


def memoized_parse(kind: str, path: str, parse: Callable[[str], Any]) -> Any:
    try:
        st = os.stat(path)
    except OSError:
        return parse(path)  # let the parser raise its own error
    key = (kind, os.path.abspath(path), st.st_mtime_ns, st.st_size)
    hit = _MEMO.get(key)
    if hit is None:
        hit = parse(path)
        if isinstance(hit, list):
            hit = tuple(hit)  # freeze: shared across all callers
        if len(_MEMO) >= _MAX_ENTRIES:
            # evict ONE entry (FIFO — dicts iterate in insertion
            # order) instead of clearing: a 5k-file directory scan
            # crossing the cap would otherwise drop every hot header
            # at once and re-parse the whole working set
            _MEMO.pop(next(iter(_MEMO)))
        _MEMO[key] = hit
    return hit
