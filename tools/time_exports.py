"""Warm best-of-N timing for the single-file exports (guide §1).

Usage: python tools/time_exports.py [-nN] [sf_dir] fmt [fmt ...]

fmt ∈ dta, sav, zsav, xpt, por, sas7bdat, rle, rdc. Each export writes
the sf lineitem table to a temp file, one untimed warm pass then N
timed passes, printing ``fmt: best med [runs...]`` — the same unit
bench.py's export_* entries time, without the sweep around it.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    from polars_readstat_spark.session import get_spark
    from polars_readstat_spark.tables import load_table

    spark = get_spark("time_exports")
    li = load_table(spark, sf_dir, "lineitem")
    out = tempfile.mkdtemp(prefix="time_exports_")

    def writer_for(fmt: str):
        if fmt == "dta":
            from polars_readstat_spark.writers.dta import write_dta

            return lambda: write_dta(li, f"{out}/li.dta")
        if fmt == "sav":
            from polars_readstat_spark.writers.sav import write_sav

            return lambda: write_sav(li, f"{out}/li.sav")
        if fmt == "zsav":
            from polars_readstat_spark.writers.sav import write_sav

            return lambda: write_sav(li, f"{out}/li.zsav")
        if fmt == "xpt":
            from polars_readstat_spark.writers.xpt import write_xpt

            return lambda: write_xpt(li, f"{out}/li.xpt")
        if fmt == "por":
            from polars_readstat_spark.writers.por import write_por

            return lambda: write_por(li, f"{out}/li.por")
        if fmt == "sas7bdat":
            from polars_readstat_spark.writers.sas7bdat import write_sas7bdat

            return lambda: write_sas7bdat(li, f"{out}/li.sas7bdat")
        if fmt in ("rle", "rdc"):
            from polars_readstat_spark.writers.sas7bdat import write_sas7bdat

            return lambda: write_sas7bdat(
                li, f"{out}/li_{fmt}.sas7bdat", compress=fmt
            )
        raise SystemExit(f"unknown fmt {fmt!r}")

    for fmt in args:
        run = writer_for(fmt)
        spark.sparkContext.setJobDescription(f"warm:export_{fmt}")
        run()
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"time:export_{fmt}:{i}")
            t0 = time.perf_counter()
            run()
            runs.append(time.perf_counter() - t0)
        print(
            f"{fmt}: best={min(runs):.3f} med={statistics.median(runs):.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
