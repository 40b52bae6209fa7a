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


# Cross-query session memo: small derived tables (minhash signatures,
# simhash fingerprints, exploded embeddings) that several registry
# queries re-derive identically. scoped_persist can't share them —
# each query builds a NEW DataFrame object, so its persist only serves
# that query's own self-joins. The memo keys on
# (application, corpus dir, name) and hands every caller the same
# persisted table (one short row per doc/vector — a few MB at bench
# scale); switching to a different corpus dir evicts the previous
# corpus's entries, mirroring the connected-components label memo.
_MEMO: dict[tuple, object] = {}


def session_memo(spark, sf_dir, name: str, build):
    """Return a persisted DataFrame for (app, sf_dir, name), building
    it with `build()` on first use."""
    key = (spark.sparkContext.applicationId, str(sf_dir), name)
    hit = _MEMO.get(key)
    if hit is not None:
        return hit
    df = build().persist()
    for k in [k for k in _MEMO if k[:2] != key[:2]]:
        try:
            _MEMO.pop(k).unpersist()
        except Exception:  # noqa: BLE001
            pass
    _MEMO[key] = df
    return df
