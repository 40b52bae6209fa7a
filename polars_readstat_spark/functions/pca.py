"""Distributed top-principal-component via power iteration.

The covariance-free formulation: each step computes
``y = Σ_rows (row·x)·row = (XᵀX)·x`` as one pass over the data —
an explode, a windowed per-vector dot product, and a d-row
aggregation — then renormalizes x ← y/‖y‖ on the driver (d scalars,
never data). Iterating converges to the dominant eigenvector of the
(uncentered) Gram matrix; pass ``center=True`` to subtract the column
means first (classical PCA), computed with one extra aggregation.

Scale shape: every iteration is two shuffles over N·d exploded rows,
independent of d² (building the covariance would explode N·d² rows —
at d=1024 that is three orders of magnitude more traffic). Driver
state is one d-vector per iteration. This mirrors the public
power-iteration formulation (Golub & Van Loan; Spark MLlib's RowMatrix
uses the same matvec-without-materializing-Gram idea).

The oracle-checked single step lives in queries/similarity.py
(`pca_power_iter_step`, exact-integer variant); this module is the
float production loop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _matvec(e: DataFrame, x: list[float], centered_means: list[float] | None):
    """One y = (XᵀX)·x pass; returns the d-vector y (driver list)."""
    d = len(x)
    xlit = F.array(*[F.lit(float(v)) for v in x])
    ex = e.select(F.posexplode("embedding").alias("j", "ev"), "vec_id")
    ev = F.col("ev").cast("double")
    if centered_means is not None:
        mlit = F.array(*[F.lit(float(m)) for m in centered_means])
        ev = ev - F.element_at(mlit, F.col("j") + 1)
    ex = ex.select(
        "vec_id",
        "j",
        ev.alias("ev"),
        (ev * F.element_at(xlit, F.col("j") + 1)).alias("evx"),
    )
    from pyspark.sql import Window as W

    ex = ex.withColumn(
        "dot", F.sum("evx").over(W.partitionBy("vec_id"))
    )
    rows = (
        ex.groupBy("j")
        .agg(F.sum(F.col("dot") * F.col("ev")).alias("y"))
        .collect()
    )
    y = [0.0] * d
    for r in rows:
        y[r["j"]] = float(r["y"])
    return y


def top_component(
    df: DataFrame,
    dim: int,
    iters: int = 12,
    center: bool = False,
) -> tuple[list[float], float]:
    """(unit eigenvector, eigenvalue of XᵀX) for the dominant
    component of df.embedding (array<float/double> of length `dim`).

    Deterministic: the start vector is the fixed integer ramp
    x_j = ((37j + 11) mod 21) − 10 (the same seed the oracle-checked
    step uses), so runs are reproducible with no RNG state.
    """
    means = None
    if center:
        sums = (
            df.select(F.posexplode("embedding").alias("j", "ev"))
            .groupBy("j")
            .agg(
                F.sum(F.col("ev").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        means = [0.0] * dim
        for r in sums:
            means[r["j"]] = r["s"] / r["n"]
    x = [float(((37 * j + 11) % 21) - 10) for j in range(dim)]
    n0 = math.sqrt(sum(v * v for v in x)) or 1.0
    x = [v / n0 for v in x]
    eig = 0.0
    for _ in range(iters):
        y = _matvec(df, x, means)
        # Rayleigh quotient with unit x: λ ≈ x·y
        eig = sum(a * b for a, b in zip(x, y))
        n = math.sqrt(sum(v * v for v in y))
        if n == 0.0:
            break
        x = [v / n for v in y]
    return x, eig
