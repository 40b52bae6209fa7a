"""Shared row-range partition sizing for the fixed-width scan readers.

Two regimes:
- big inputs: ~48 MB of raw record bytes per partition — large enough
  that per-task Python-worker round-trips amortize (measured: the
  harness floor is ~20 ms/task), small enough to fit executor memory
  with decode headroom at any record width.
- inputs smaller than cores × 48 MB: the byte heuristic alone
  under-partitions (a 200 MB file → 4 partitions on a 32-core
  local[32], leaving 28 cores idle — measured 0.97 s vs 0.65 s for
  the same scan at 16-32 partitions). When a SparkContext is active
  at planning time, split further toward one partition per core,
  floored at ~8 MB / 64k rows per partition so tiny files never
  explode into confetti tasks.

The floor keeps the 100 TB shape unchanged: a big scan is thousands
of 48 MB ranges regardless of cluster width; only the
single-small-file-on-a-wide-cluster corner gets more fan-out.
"""

from __future__ import annotations

PART_BYTES = 48 << 20
MIN_PART_BYTES = 8 << 20
MIN_PART_ROWS = 65536


def rows_per_partition(record_width: int, total_rows: int) -> int:
    """Default rows per partition for a fixed-width record scan."""
    rw = max(record_width, 1)
    per = max(MIN_PART_ROWS, PART_BYTES // rw)
    cores = _active_cores()
    if cores > 1 and total_rows > 0:
        want = (total_rows + cores - 1) // cores
        floor = max(MIN_PART_ROWS, MIN_PART_BYTES // rw)
        per = max(floor, min(per, want))
    return per


def _active_cores() -> int:
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        return int(sc.defaultParallelism) if sc is not None else 0
    except Exception:  # planning must never fail on harness internals
        return 0


def pages_per_partition(page_length: int, n_pages: int) -> int:
    """Same policy for page-granular partitioning (compressed SAS)."""
    pl = max(page_length, 1)
    per = max(1, PART_BYTES // pl)
    cores = _active_cores()
    if cores > 1 and n_pages > 0:
        want = (n_pages + cores - 1) // cores
        floor = max(1, MIN_PART_BYTES // pl)
        per = max(floor, min(per, want))
    return per
