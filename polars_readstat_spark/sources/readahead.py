"""Bounded read-ahead for high-latency byte sources.

On local disk an in-reader prefetch thread only duplicates OS
readahead (SCALE.md A4 note), so every reader consumes its pages
inline by default. On object storage each range request pays
~50-100 ms first-byte latency that the OS cannot hide, and the win is
overlapping the NEXT range's latency with the CURRENT range's decode —
exactly one producer thread and a depth-bounded queue, never an
unbounded buffer (reference parity: scan_prefetch.rs:35-52 bounds its
prefetch the same way).

``readahead(it, depth)`` wraps any batch iterator: a daemon thread
pulls up to ``depth`` items ahead while the consumer drains the queue.
Memory is bounded by depth × batch size; exceptions re-raise in the
consumer with their original traceback; an abandoned consumer lets the
producer park on the full queue and die with the process (daemon) —
generator close() also unblocks it explicitly.

Enabled per-read via ``io_readahead`` (depth, default 0 = off):

    spark.read.format("readstat").option("io_readahead", "2").load(p)

The bench floor probes (``floor_ranges50ms_*``) measure the shape this
is for: 16 ranges × (50 ms fetch + ~25 ms decode) per partition runs
~1.6× faster with depth-2 readahead; with 0 ms fetch the wrapper costs
<3% — which is why it stays off for local files.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator

from pyspark.sql.datasource import DataSourceReader
from polars_readstat_spark.sources.fs import fs_open

_SENTINEL = object()


class _Raised:
    __slots__ = ("exc",)

    def __init__(self, exc: BaseException):
        self.exc = exc


def readahead(it: Iterator, depth: int = 2) -> Iterator:
    """Yield from `it` with up to `depth` items produced ahead by a
    single background thread. Order-preserving; exceptions from the
    producer re-raise at the consumer's next pull."""
    if depth <= 0:
        yield from it
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def relay(item) -> bool:
        """Stop-checked timed put: never drops `item` while the consumer
        is still alive, never parks forever once it's gone. Returns
        False only when the consumer abandoned the generator."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def pump() -> None:
        try:
            for item in it:
                if not relay(item):
                    return
            relay(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — relayed, not dropped
            # the terminator gets the same loop as data items: a busy
            # consumer (>1s behind) must still receive the error, else
            # an inner-reader failure becomes an indefinite task hang
            relay(_Raised(e))

    t = threading.Thread(target=pump, daemon=True, name="prs-readahead")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, _Raised):
                raise item.exc
            yield item
    finally:
        # consumer abandoned early (limit, task kill): unblock the
        # producer's put loop so the thread exits promptly
        stop.set()


def parse_readahead_opts(options) -> tuple[int, float]:
    """(io_readahead depth, simulated latency in seconds) from a
    datasource options mapping — the pair every pipelining reader
    consumes."""
    depth = int(options.get("io_readahead", 0) or 0)
    lat = float(options.get("io_simulated_latency_ms", 0) or 0) / 1000.0
    return depth, lat


def fetch_row_ranges(
    path: str,
    data_offset: int,
    record_width: int,
    start: int,
    n: int,
    batch_rows: int,
    sim_latency_s: float = 0.0,
    io_readahead: int = 0,
):
    """Raw fixed-width row-range fetches for [start, start+n), yielded
    as (pos, cnt, buf) — the fetch half of the fetch/decode pipeline
    shared by the dta / uncompressed-sav / xpt readers. With
    io_readahead > 0 the NEXT range's (simulated) first-byte latency
    overlaps the caller's decode of the CURRENT range."""

    def fetched():
        with fs_open(path) as f:
            pos = start
            end = start + n
            while pos < end:
                cnt = min(batch_rows, end - pos)
                if sim_latency_s:
                    import time as _t

                    _t.sleep(sim_latency_s)
                f.seek(data_offset + pos * record_width)
                yield pos, cnt, f.read(cnt * record_width)
                pos += cnt

    it = fetched()
    if io_readahead > 0:
        it = readahead(it, io_readahead)
    return it


class ReadaheadReader(DataSourceReader):
    """Wraps any format reader, pulling its batches through a bounded
    readahead queue — the opt-in IO/decode overlap for high-latency
    stores. Partition planning is delegated untouched, so the scan's
    parallel shape is identical with or without the wrapper."""

    # once wrapped, the readahead obligation is met — the dispatch in
    # datasource.reader() must not stack a second queue on top
    handles_readahead = True

    def __init__(self, inner: DataSourceReader, depth: int):
        self.inner = inner
        self.depth = int(depth)

    def partitions(self):
        return self.inner.partitions()

    def read(self, partition):
        return readahead(self.inner.read(partition), self.depth)
