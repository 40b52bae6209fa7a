"""SAV/ZSAV DataSourceReader.

Partitioning (reference spss/polars_output.rs:362-430 strategy,
re-planned for Spark — the reference reads compressed streams
strictly serially, PARALLELIZATION.md:34-40):
- uncompressed: exact row-range partitions (case = case_size×8 bytes
  ⇒ byte seek), same scale story as the Stata reader;
- bytecode/zsav proven all-literal at plan time
  (validate_literal_stream, sidecar-cached): the byte↔element map is
  affine, so row-range partitions decode independently — zsav tasks
  inflate only their own zlib blocks;
- any other bytecode stream (bias/mixed commands — what SPSS itself
  writes for integer-heavy data): a plan-time checkpoint index
  (build_checkpoint_index, sidecar-cached) records command-group
  boundaries; row-range tasks restart the decoder at the nearest
  checkpoint. Small streams stay serial with memory bounded by one
  chunk (iter_compressed_rows) — a 50 GB decompressed zsav reads in
  constant executor memory either way.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import DataSourceReader, InputPartition
from polars_readstat_spark.sources.fs import fs_size


class RowRange(InputPartition):
    def __init__(
        self,
        start: int,
        n: int,
        literal: bool = False,
        ckpt: tuple[int, int] | None = None,
        pipeline: bool = True,
    ):
        self.start = start
        self.n = n
        # False when the scan fans out to ~every core: the walk→scatter
        # thread pipeline inside iter_compressed_elements only helps
        # when the host has spare cycles (serial/few-partition reads);
        # under full task fan-out it is pure oversubscription —
        # measured 0.37 s inline vs 0.51 s pooled per ACS checkpoint
        # partition at 32 concurrent tasks, and 11.0 s pooled vs
        # 14.3 s inline for the same file consumed serially (r7)
        self.pipeline = pipeline
        # True: the bytecode stream was proven all-literal at plan
        # time (validate_literal_stream), so this range decodes
        # independently via the affine byte↔element map
        self.literal = literal
        # (byte_off, el_off) of the nearest plan-time checkpoint at or
        # before this range's first element (build_checkpoint_index):
        # the general-stream parallel path for bias/mixed bytecode
        self.ckpt = ckpt

    def retarget(self, start: int, n: int) -> "RowRange":
        """Same plan state, narrower row window — the zone-map stripe
        trimming hook (sources/filters.py). Sound because ckpt only
        promises to sit AT OR BEFORE the range's first element (a
        later start just skips more from the same checkpoint), the
        literal affine map addresses any row directly, and pipeline
        is a pure execution hint."""
        return RowRange(
            start,
            n,
            literal=self.literal,
            ckpt=self.ckpt,
            pipeline=self.pipeline,
        )


def _opt_bool(options, key, default=False):
    v = options.get(key)
    return default if v is None else str(v).lower() in {"1", "true", "yes"}


def _opt_int(options, key, default=None):
    v = options.get(key)
    return default if v in (None, "") else int(v)


class SavReader(DataSourceReader):
    def __init__(self, path: str, options):
        from polars_readstat_spark.sources.sav.meta import parse_sav_meta

        self.path = path
        self.options = dict(options)
        self.meta = parse_sav_meta(path)
        from polars_readstat_spark.sources.datasource import _selected_vars

        self.col_indices = _selected_vars(self.meta, options)
        self.value_labels_as_strings = _opt_bool(options, "value_labels_as_strings")
        self.missing_string_as_null = _opt_bool(options, "missing_string_as_null")
        self.row_index_name = options.get("row_index_name")
        self.row_index_offset = _opt_int(options, "row_index_offset", 0)
        self.limit = _opt_int(options, "n_rows", _opt_int(options, "limit"))
        self.offset = _opt_int(options, "offset", 0) or 0
        self.batch_size = _opt_int(options, "batch_size")
        self.rows_per_partition = _opt_int(options, "rows_per_partition")
        self.target_parallelism = _opt_int(options, "target_parallelism")
        # every path pipelines io_readahead itself: the uncompressed
        # row loop and the compressed chunk loop (sequential +
        # checkpoint, via iter_compressed_elements) at their
        # fetch/decode seams; the literal path issues ONE contiguous
        # range fetch per partition, which has no loop to pipeline
        from polars_readstat_spark.sources.readahead import (
            parse_readahead_opts,
        )

        self.io_readahead, self.sim_latency_s = parse_readahead_opts(options)
        # bench A/B switch for the zsav inflate pool (default on);
        # the serial arm of the floor_zsav_lat50_* probe pair sets 0
        self.zsav_pool = str(options.get("io_zsav_pool", "1")) != "0"
        self.handles_readahead = True
        from polars_readstat_spark.sources import informative as inf

        self.informative = inf.parse_opts(options)

    def _total_rows(self) -> int:
        m = self.meta
        if m.nobs >= 0:
            return m.nobs
        if m.compression == 0:
            sz = fs_size(self.path) - m.data_offset
            return sz // m.record_width
        # compressed with unknown count: one streaming pass (rare)
        from polars_readstat_spark.sources.sav.decode import count_compressed_rows

        return count_compressed_rows(m)

    def _row_span(self) -> tuple[int, int]:
        total = self._total_rows()
        start = min(self.offset, total)
        n = total - start
        if self.limit is not None:
            n = min(n, self.limit)
        return start, n

    def partitions(self):
        start, n = self._row_span()
        if self.meta.compression != 0:
            # bytecode streams are sequential in general — but the
            # all-literal framing (the only one our writer emits, and
            # a real shape for non-integer-heavy data) has an affine
            # byte↔element map, so after ONE validated sequential
            # pass (plan-time, sidecar-cached) the stream partitions
            # exactly like an uncompressed file. Anything else stays
            # the reference-parity serial plan.
            lit = False
            if self.meta.nobs > 0 and n > 0:
                from polars_readstat_spark.sources.sav.decode import (
                    validate_literal_stream,
                )

                try:
                    lit = validate_literal_stream(self.meta, self.meta.nobs)
                except Exception as e:
                    # degrading to the serial plan is a 10-20x wall
                    # regression on a big stream — never do it silently
                    # (BENCH r7 recorded a 21 s zsav read where the
                    # isolated wall is 1.2 s; the fallback path was the
                    # only explanation that fits)
                    import sys as _sys

                    print(
                        f"readstat: literal validation failed on "
                        f"{self.path}: {e!r} — trying checkpoint plan",
                        file=_sys.stderr,
                    )
                    lit = False
            if not lit:
                # general bytecode (bias/mixed commands — what SPSS
                # itself writes for integer-heavy data): one plan-time
                # checkpoint walk (sidecar-cached) buys exact
                # row-range partitions; small streams stay serial
                return self._ckpt_partitions(start, n) or [
                    RowRange(start, n)
                ]
            rw = max(self.meta.record_width, 1)
            per = self.rows_per_partition
            if per is None:
                from polars_readstat_spark.sources.partplan import (
                    rows_per_partition,
                )

                per = rows_per_partition(rw, n, self.target_parallelism)
            parts = []
            pos = start
            while pos < start + n:
                cnt = min(per, start + n - pos)
                parts.append(RowRange(pos, cnt, literal=True))
                pos += cnt
            return parts or [RowRange(start, 0)]
        rw = max(self.meta.record_width, 1)
        per = self.rows_per_partition
        if per is None:
            from polars_readstat_spark.sources.partplan import (
                rows_per_partition,
            )

            per = rows_per_partition(rw, n, self.target_parallelism)
        parts = []
        pos = start
        while pos < start + n:
            cnt = min(per, start + n - pos)
            parts.append(RowRange(pos, cnt))
            pos += cnt
        return parts or [RowRange(start, 0)]

    def _ckpt_partitions(self, start: int, n: int):
        """Row-range partitions for a general (non-all-literal)
        bytecode stream via a plan-time checkpoint index; None when
        not worthwhile (small stream / single partition)."""
        if n <= 0:
            return None
        from polars_readstat_spark.sources.sav.decode import (
            build_checkpoint_index,
            stream_nbytes,
        )

        meta = self.meta
        cs = meta.case_size
        # below ~16 MB of stream the serial decode is already fast and
        # the walk pass isn't worth planning — unless the caller asked
        # for explicit partition sizing (tests, tuned reads)
        if self.rows_per_partition is None and stream_nbytes(meta) < (
            16 << 20
        ):
            return None
        rw = max(meta.record_width, 1)
        per = self.rows_per_partition
        if per is None:
            from polars_readstat_spark.sources.partplan import (
                rows_per_partition,
            )

            per = rows_per_partition(rw, n, self.target_parallelism)
        if per >= n:
            return None
        # checkpoint spacing ~per/4 rows of elements (waste per task ≤
        # one spacing), quantized to a power of two so repeated reads
        # with near-equal plans share one sidecar
        # spacing per/16 rows of elements: a task re-decodes at most
        # one spacing of lead-in from its checkpoint, so tighter
        # spacing directly cuts tail skew (per/4 meant up to 25% of a
        # partition's span wasted on the lead-in; now ≤6%). The cost
        # is only sidecar entries — the walk is one pass either way.
        raw_sp = max((per * cs) // 16, 8 * cs, 1024)
        ckpt_els = 1 << (int(raw_sp).bit_length() - 1)
        try:
            ck, _total_el = build_checkpoint_index(meta, ckpt_els)
        except Exception as e:
            import sys as _sys

            print(
                f"readstat: checkpoint index failed on {meta.path}: "
                f"{e!r} — falling back to the SERIAL bytecode plan",
                file=_sys.stderr,
            )
            return None
        if ck.shape[0] < 2:
            return None
        from polars_readstat_spark.sources.partplan import _active_cores

        cores = self.target_parallelism or _active_cores() or 1
        n_parts = (n + per - 1) // per
        pipe = 2 * n_parts <= cores
        parts = []
        pos = start
        end = start + n
        while pos < end:
            cnt = min(per, end - pos)
            j = int(np.searchsorted(ck[:, 1], pos * cs, side="right") - 1)
            parts.append(
                RowRange(
                    pos, cnt,
                    ckpt=(int(ck[j, 0]), int(ck[j, 1])),
                    pipeline=pipe,
                )
            )
            pos += cnt
        return parts

    def read(self, partition: RowRange):
        from polars_readstat_spark.sources.sav.decode import (
            decode_rows,
            iter_compressed_rows,
        )

        meta = self.meta
        rw = meta.record_width
        ncols = max(len(self.col_indices), 1)
        from polars_readstat_spark.sources.partplan import (
            default_batch_rows,
        )

        batch_rows = self.batch_size or default_batch_rows(
            ncols, self.target_parallelism
        )

        def with_row_index(batch, pos, cnt):
            if not self.row_index_name:
                return batch
            idx = pa.array(
                np.arange(pos, pos + cnt, dtype=np.int64)
                + ((self.row_index_offset or 0) - self.offset)
            )
            return pa.RecordBatch.from_arrays(
                [*batch.columns, idx],
                names=[*batch.schema.names, self.row_index_name],
            )

        def emit(rows, pos, cnt):
            batch = decode_rows(
                meta,
                rows,
                self.col_indices,
                self.value_labels_as_strings,
                self.missing_string_as_null,
                informative=self.informative,
            )
            return with_row_index(batch, pos, cnt)

        if partition.n == 0:
            yield emit(np.empty((0, rw), dtype=np.uint8), partition.start, 0)
            return

        if meta.compression != 0:
            ck = getattr(partition, "ckpt", None)
            if ck is not None:
                from polars_readstat_spark.sources.sav.decode import (
                    iter_checkpoint_rows,
                )

                for pos, rows in iter_checkpoint_rows(
                    meta, partition.start, partition.n, batch_rows,
                    ck[0], ck[1],
                    pipeline=getattr(partition, "pipeline", True),
                    io_readahead=self.io_readahead,
                    sim_latency_s=self.sim_latency_s,
                    zsav_pool=self.zsav_pool,
                ):
                    yield emit(rows, pos, rows.shape[0])
                return
            if getattr(partition, "literal", False):
                from polars_readstat_spark.sources.sav.decode import (
                    iter_literal_rows,
                )

                for pos, rows in iter_literal_rows(
                    meta, partition.start, partition.n, batch_rows,
                    meta.nobs,
                    sim_latency_s=self.sim_latency_s,
                    zsav_pool=self.zsav_pool,
                ):
                    yield emit(rows, pos, rows.shape[0])
                return
            # sequential command stream: decode once, bounded memory —
            # one chunk + one partial case live at a time (round-1 OOM
            # fix; reference streams serially too, spss/data.rs:1628)
            for pos, rows in iter_compressed_rows(
                meta, partition.start, partition.n, batch_rows,
                io_readahead=self.io_readahead,
                sim_latency_s=self.sim_latency_s,
                zsav_pool=self.zsav_pool,
            ):
                yield emit(rows, pos, rows.shape[0])
            return

        # raw range fetches, separable from decode so io_readahead
        # overlaps the NEXT range's first-byte latency with the
        # CURRENT range's decode (shared seam, sources/readahead.py)
        from polars_readstat_spark.sources.readahead import (
            fetch_row_ranges,
        )

        it = fetch_row_ranges(
            self.path, meta.data_offset, rw,
            partition.start, partition.n, batch_rows,
            self.sim_latency_s, self.io_readahead,
        )
        for pos, cnt, buf in it:
            rows = np.frombuffer(buf, dtype=np.uint8, count=cnt * rw).reshape(
                cnt, rw
            )
            yield emit(rows, pos, cnt)
