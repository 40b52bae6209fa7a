"""A/B timing harness for the bytecode-SAV read regression (VERDICT
r07 wrong#2): times a full read of the bias/bytecode-compressed ACS
fixture, best-of-N in one warm session, printing one line per trial
plus the best. Run with different checked-out read paths (git stash /
worktree) against the SAME fixture file to isolate reader-side causes,
or against fixtures written by different writer versions to isolate
write-side byte-mix causes.

Usage: python tools/bisect_bytecode_read.py [fixture.sav] [n_trials]
"""

from __future__ import annotations

import os
import sys
import time

# BISECT_REPO lets the same script time a different checkout (a git
# worktree at a suspect commit) against the same fixture bytes
REPO = os.environ.get(
    "BISECT_REPO", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prs_bench_acs_v1_bc.sav"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from polars_readstat_spark.session import get_spark

    spark = get_spark("bisect")
    import polars_readstat_spark as prs

    prs.register(spark)
    rd = lambda: spark.read.format("readstat").load(path)  # noqa: E731
    # worker warmup (plan + 16 rows)
    rd().limit(16).write.format("noop").mode("overwrite").save()
    trials = []
    for i in range(n):
        t0 = time.perf_counter()
        rd().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        trials.append(dt)
        print(f"trial {i}: {dt:.3f}s", flush=True)
    nparts = rd().rdd.getNumPartitions()
    print(
        f"BEST {min(trials):.3f}s nparts={nparts} "
        f"size={os.path.getsize(path)} path={path}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
