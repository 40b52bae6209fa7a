"""Compute the CORRECTNESS-window rotation plan from driver history.

The driver checks the FIRST 50 entries of ``queries/registry.py``'s
``_PRIORITY`` each round and records per-query green/red rows in
``CORRECTNESS_r{N}.json``. The rotation contract (README / VERDICT
r11-12): no query's newest driver green may go more than 4 rounds
stale. This tool reads the union of every ``CORRECTNESS_r*.json`` in
the repo root and emits the next round's window, ordered:

  1. queries registered but NEVER driver-checked (newest code first
     is unknowable here, so registration order),
  2. oldest-newest-green first among the rest.

Usage:
  python tools/rotation_plan.py             # human-readable plan
  python tools/rotation_plan.py --tuple     # paste-ready _PRIORITY body
  python tools/rotation_plan.py --window 50 # override window size

The output is the input to hand-editing ``_PRIORITY`` (keep the
"changed-this-round first" convention: queries whose code path
changed in the current round go before the staleness frontier).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_history(repo: str = REPO) -> dict[str, int]:
    """Map query name -> newest round with a fully-green driver row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                # hash_match is None for rows-only checks; count those
                # as green only if no stronger row exists (handled by
                # max(), since a later hash-green overwrites).
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            )
            if green:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def plan(window: int) -> tuple[list[tuple[str, int | None]], int]:
    from polars_readstat_spark.queries import registry

    registry._ensure_loaded()
    names = list(registry.QUERIES)
    newest = load_history()
    latest_round = max(newest.values(), default=0)

    never = [n for n in names if n not in newest]
    seen = sorted(
        (n for n in names if n in newest),
        key=lambda n: (newest[n], names.index(n)),
    )
    ordered: list[tuple[str, int | None]] = [(n, None) for n in never]
    ordered += [(n, newest[n]) for n in seen]
    return ordered[:window], latest_round


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--tuple", action="store_true", help="emit a paste-ready _PRIORITY body")
    args = ap.parse_args()

    window, latest = plan(args.window)
    if args.tuple:
        for name, rnd in window:
            tag = "never driver-checked" if rnd is None else f"newest green r{rnd:02d}"
            print(f'    "{name}",  # {tag}')
        return

    print(f"# rotation plan (window={args.window}, latest driver round=r{latest:02d})")
    boundary = latest - 3  # a green at this round goes >4 stale next round
    for i, (name, rnd) in enumerate(window, 1):
        if rnd is None:
            flag = "NEVER-CHECKED"
        elif rnd <= boundary:
            flag = f"STALE-NEXT (r{rnd:02d})"
        else:
            flag = f"r{rnd:02d}"
        print(f"{i:3d}. {name:45s} {flag}")


if __name__ == "__main__":
    main()
