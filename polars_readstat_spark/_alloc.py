"""Process allocation hygiene for decode-heavy workloads.

numpy madvises MADV_HUGEPAGE on every allocation ≥ 4 MiB; with the
kernel's ``transparent_hugepage/defrag`` at ``madvise`` (this host's
setting, and a common production default) those faults may run
SYNCHRONOUS memory compaction. Measured here on the bytecode-SAV
decode (45 MB element matrices + similar temps): the FIRST full
partition decode in a fresh process walls 9.5 s with the madvise on
vs 0.58 s with it off — identical work, the difference is entirely
direct-compaction stalls. Spark Python Data Source workers are fresh
processes, so every first task per worker paid that tax; it is also
the best available explanation for the whole-VM "stall windows" the
bench harness has been defending against since round 5 (SCALE.md ±40%
note), which shrank once this was disabled.

Throughput-wise the hugepage TLB win on this access pattern
(streaming decode, arrays die young) is noise — warm timings were
equal with and without — so the trade is strictly one-sided here.

Disabled at package import (driver AND workers: unpickling any reader
imports the package) via numpy's runtime toggle; the env var is also
set so python workers forked AFTER this import inherit it regardless
of numpy import order.
"""

from __future__ import annotations

import os


def disable_hugepage_madvise() -> None:
    """Idempotent; safe on numpy 1.x/2.x and non-Linux (no-op).

    PRS_KEEP_HUGEPAGE=1 is the escape hatch: a deployment whose
    kernel runs defrag=defer (no synchronous compaction, so the
    stall this guards against cannot happen) may prefer to keep the
    hugepage TLB win for long-lived buffers."""
    if os.environ.get("PRS_KEEP_HUGEPAGE") == "1":
        return
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    for mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
        try:
            import importlib

            ma = importlib.import_module(mod)
            ma._set_madvise_hugepage(False)
            return
        except Exception:  # noqa: BLE001 — private API, version-dependent
            continue
