"""Isolated per-query timing: noop-sink best-of-N in one warm session.

Usage: python tools/time_queries.py [-nN] [sf_dir] query [query ...]

Times each named registry query through the noop sink (guide §1.4)
after one untimed warm run (fixtures, JIT, memos), printing
``name: best median [runs...]``. Used to separate genuine per-query
cost from full-sweep regime noise while optimizing (guide §1.1).
"""

from __future__ import annotations

import os
import statistics
import sys
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
    names = args

    from polars_readstat_spark.queries import all_queries
    from polars_readstat_spark.queries._cache import release_all
    from polars_readstat_spark.session import get_spark

    import polars_readstat_spark as prs

    spark = get_spark("time_queries")
    prs.register(spark)
    qs = all_queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: WARM-ERROR {e!r:.200}")
            release_all()
            continue
        runs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"time:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        release_all()
        print(
            f"{name}: best={min(runs):.3f} med={statistics.median(runs):.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
