"""Sign-random-projection LSH over the `embeddings` table — the scale
path for similarity search and embedding near-dup detection.

32 hyperplanes → 32-bit code → 4 bands × 8 bits. Two vectors become
join candidates when they share any band key, turning the quadratic
pair search into an equi-join on (band_idx, band_key) — exactly the
MinHash-banding shape in queries/dedup.py, but for dense vectors.
Band width sets the candidate volume: 8-bit bands give 256 buckets per
band, so expected candidates are ~4·n²/256 — the exact-cosine verify
stage stays linear-ish instead of quadratic (4-bit bands were measured
8× slower at sf0.1 purely from candidate explosion).

Cross-engine determinism (the oracle gate compares value hashes):

- Hyperplane coefficients come from an LCG evaluated per (plane, dim):
  ``c(p,d) = ((1103515245*(p*64+d) + 12345) % 2^31) div 2^16 - 2^14``
  — pure 64-bit integer arithmetic on nonnegative dividends, identical
  in Spark and DuckDB (the high LCG bits are kept; low bits of a
  power-of-two-modulus LCG have short periods).
- Vector elements are scaled to integers ``floor(double(x) * 1e6)``
  (float→double is exact, the product is one correctly-rounded IEEE op
  in both engines, floor is exact), so the projection sign is a sum of
  int64 products: |c| < 2^14, |x_scaled| ≲ 2^24, 64 terms → < 2^44,
  no overflow, no float summation-order wobble.

The reference has no similarity operators (SURVEY.md §2.9 "absent
entirely"); this module is part of the training-pipeline extension
surface built on the same tables.
"""

from __future__ import annotations

_PLANES = 32
_BANDS = 4
_BITS_PER_BAND = _PLANES // _BANDS
_XSCALE = "1000000.0"


def _coef(p_expr: str) -> str:
    """Integer LCG coefficient for plane*64+dim index expression."""
    return (
        f"(((1103515245 * ({p_expr}) + 12345) % 2147483648) div 65536 - 16384)"
    )


def lsh_scaled_dim_expr(x_col: str = "xf") -> str:
    """Scaled-integer value of one exploded vector element."""
    return f"CAST(FLOOR(CAST({x_col} AS DOUBLE) * {_XSCALE}) AS BIGINT)"


def lsh_coef(p: int, d: int) -> int:
    """The same LCG coefficient, evaluated at plan-build time. Python's
    `%` and `//` on nonnegative ints match the SQL `%` / `div` exactly."""
    return ((1103515245 * (p * 64 + d) + 12345) % 2147483648) // 65536 - 16384


def lsh_coef_rows() -> list[tuple]:
    """64 rows (d, c0..c31) — the hyperplane matrix as a broadcastable
    dim table. Joining this beats inlining the LCG arithmetic into 32
    SUM expressions: the generated plan is 32 small column products,
    which Catalyst optimizes/compiles in milliseconds instead of
    seconds (measured: inline expressions cost ~5 s of driver time per
    cold run at any data size)."""
    return [
        tuple([d] + [lsh_coef(p, d) for p in range(_PLANES)]) for d in range(64)
    ]


def lsh_bands_stack() -> str:
    """stack() expr turning s0..s31 sum columns into (band_idx, band_key)."""
    parts = []
    for b in range(_BANDS):
        bits = ", ".join(
            f"CASE WHEN s{b * _BITS_PER_BAND + i} >= 0 THEN '1' ELSE '0' END"
            for i in range(_BITS_PER_BAND)
        )
        parts.append(f"{b}, concat({bits})")
    return f"stack({_BANDS}, " + ", ".join(parts) + ") AS (band_idx, band_key)"


def lsh_bands_duck(table: str = "embeddings") -> str:
    """DuckDB CTE chain ending in lsh_bands(vec_id, band_idx, band_key).

    DuckDB's `%` on nonnegative ints and `//` floor-division match the
    Spark expressions above term for term.
    """
    sums = ", ".join(
        "SUM((((1103515245 * ({p} * 64 + d) + 12345) % 2147483648) // 65536 - 16384)"
        " * x) AS s{p}".format(p=p)
        for p in range(_PLANES)
    )
    band_rows = []
    for b in range(_BANDS):
        key = " || ".join(
            f"CASE WHEN s{b * _BITS_PER_BAND + i} >= 0 THEN '1' ELSE '0' END"
            for i in range(_BITS_PER_BAND)
        )
        band_rows.append(f"SELECT vec_id, {b} AS band_idx, {key} AS band_key FROM lsh_sums")
    return f"""
    lsh_xi AS (
      SELECT e.vec_id, i.i - 1 AS d,
             CAST(FLOOR(CAST(e.embedding[i.i] AS DOUBLE) * {_XSCALE}) AS BIGINT) AS x
      FROM {table} e CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS i) i
    ),
    lsh_sums AS (
      SELECT vec_id, {sums} FROM lsh_xi GROUP BY vec_id
    ),
    lsh_bands AS (
      {" UNION ALL ".join(band_rows)}
    )
    """
