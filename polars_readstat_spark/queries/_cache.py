"""Scoped persist for intermediate tables the registry queries cache.

Query builders return un-executed DataFrames, so they can't unpersist
after "their" action — they never see it. But the driver's verify loop
builds every registry query in one session, and round-1's plain
``.persist()`` calls accumulated every band table in executor storage
for the session's lifetime. This keeps at most ``keep`` persisted
intermediates alive: building a new query evicts the oldest, so
storage memory is bounded by the most recent queries rather than the
whole run.
"""

from __future__ import annotations

_persisted: list = []


def scoped_persist(df, keep: int = 2):
    """persist() with LRU eviction of previously scoped DataFrames."""
    while len(_persisted) >= keep:
        try:
            _persisted.pop(0).unpersist()
        except Exception:
            pass
    df = df.persist()
    _persisted.append(df)
    return df


def release_all() -> None:
    while _persisted:
        try:
            _persisted.pop().unpersist()
        except Exception:
            pass
