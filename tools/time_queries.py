"""Isolated per-query timing: noop-sink best-of-N in one warm session.

Usage: python tools/time_queries.py [-nN] [--keep-memo] [sf_dir] query ...

Times each named registry query through the noop sink (guide §1.4)
after one untimed warm run (fixtures, JIT), printing
``name: best median [runs...]``. Used to separate genuine per-query
cost from full-sweep regime noise while optimizing (guide §1.1).

Memo regime (VERDICT r13 next#7): by DEFAULT the cross-query session
memo (queries/_cache._MEMO) and scoped persists are cleared before
every timed run, so each number includes the query's own shared-
intermediate build — the memo-cold cost a query pays when it runs
first in a sweep. ``--keep-memo`` keeps memos across the warm + timed
runs instead (the steady-state cost a query pays when an earlier
query in the same session already built the intermediate).
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
    keep_memo = False
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    if args and args[0] == "--keep-memo":
        keep_memo = True
        args = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args

    from polars_readstat_spark.queries import all_queries
    from polars_readstat_spark.queries import _cache
    from polars_readstat_spark.queries._cache import release_all
    from polars_readstat_spark.session import get_spark

    import polars_readstat_spark as prs

    def memo_cold() -> None:
        if keep_memo:
            return
        while _cache._MEMO:
            try:
                _cache._MEMO.popitem()[1].unpersist()
            except Exception:  # noqa: BLE001
                pass
        release_all()

    spark = get_spark("time_queries")
    prs.register(spark)
    qs = all_queries()
    print(f"# memo regime: {'keep' if keep_memo else 'cold per run'}")
    for name in names:
        fn = qs[name]
        memo_cold()
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: WARM-ERROR {e!r:.200}")
            release_all()
            continue
        runs = []
        for i in range(n):
            memo_cold()
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
