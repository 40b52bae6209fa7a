"""Fixed-fixture probe for floor_plan_5kfiles (VERDICT r13 next#4).

Usage: python tools/probe_plan5k.py [repo_root] [-nN]

Plans the standing /tmp/prs_plan5k_v1 5,000-file directory through the
readstat datasource of the given checkout (default: this repo),
best-of-N in one fresh session, and prints per-run walls. Run it
against multiple checkouts (git worktrees) to bisect a plan-time
regression at fixed fixtures and fixed VM regime.
"""

from __future__ import annotations

import os
import sys
import time

args = [a for a in sys.argv[1:] if not a.startswith("-n")]
nflag = [a for a in sys.argv[1:] if a.startswith("-n")]
n = int(nflag[0][2:]) if nflag else 5
root = os.path.abspath(args[0]) if args else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, root)

from polars_readstat_spark.session import get_spark  # noqa: E402

import polars_readstat_spark as prs  # noqa: E402

D5K = "/tmp/prs_plan5k_v1"
assert os.path.isdir(D5K) and len(os.listdir(D5K)) == 5000, D5K

spark = get_spark("probe-plan5k")
prs.register(spark)
# one small-read warmup so plan-worker spin-up is not in run 1
spark.read.format("readstat").load(
    os.path.join(D5K, "f0000.dta")
).limit(1).write.format("noop").mode("overwrite").save()
runs = []
for i in range(n):
    t0 = time.perf_counter()
    df = spark.read.format("readstat").load(D5K)
    df.rdd.getNumPartitions()
    runs.append(round(time.perf_counter() - t0, 3))
print(f"checkout={root}")
print(f"plan5k runs={runs} best={min(runs):.3f}")
spark.stop()
