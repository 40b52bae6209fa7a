"""DataFrame-level dedup primitives (the library behind queries/dedup.py).

Each function takes and returns DataFrames — no table loading, no
registry coupling — so a user can point the same machinery at their
own corpus:

    sig   = shingle_minhash(docs, "id", "body", k=16)
    pairs = lsh_candidate_pairs(sig, "id", bands=8, rows_per_band=2)
    comp  = near_dup_components(docs, "id", "body")

Scale shapes (see SCALE.md): shingling is a flatMap; signatures are
one map-side-combinable MIN aggregation (shuffle = one row per doc);
LSH banding turns the pair search into an equi-join on band keys;
components run the functions/graph.py label loop. Hashes are MD5 hex
so any SQL engine can replay them for differential checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingle_minhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    shingle_len: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: (id, h0..h{k-1}).

    Shingles are `shingle_len`-token windows of the whitespace-split
    text; each of the k permutations is simulated by seeding MD5 with
    the permutation index and taking the lexicographic MIN hex digest.
    """
    shingles = (
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - "
        f"{shingle_len - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {shingle_len})))"
    )
    sh = df.select(
        F.col(id_col), F.explode(F.expr(shingles)).alias("shingle")
    )
    return sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(
                f"h{i}"
            )
            for i in range(k)
        ]
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Candidate pairs from banded LSH over a minhash signature table:
    (id_a, id_b, n_shared_bands) with id_a < id_b.

    Docs sharing any band key become candidates via an equi-join on
    (band_idx, band_key) — linear shuffle, never an all-pairs scan.
    The signature must have at least bands*rows_per_band hash columns.
    """
    parts = []
    for b in range(bands):
        cols = [
            f"h{b * rows_per_band + r}" for r in range(rows_per_band)
        ]
        parts.append(f"{b}, md5(concat({', '.join(cols)}))")
    stack = (
        f"stack({bands}, {', '.join(parts)}) AS (band_idx, band_key)"
    )
    bt = sig.selectExpr(id_col, stack)
    a = bt.alias("a")
    b = bt.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def near_dup_components(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_len: int = 3,
    algorithm: str = "propagate",
) -> DataFrame:
    """End-to-end near-dup grouping: minhash → LSH pairs → connected
    components. Returns (id, component, is_keeper); singletons keep
    their own id. `algorithm="star"` switches to the O(log n)-round
    large-star/small-star loop for high-diameter pair graphs."""
    from polars_readstat_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    sig = shingle_minhash(df, id_col, text_col, k=k, shingle_len=shingle_len)
    pairs = lsh_candidate_pairs(
        sig, id_col, bands=bands, rows_per_band=rows_per_band
    ).select("id_a", "id_b")
    cc = (
        connected_components_star
        if algorithm == "star"
        else connected_components
    )
    comp = cc(
        pairs,
        src="id_a",
        dst="id_b",
        nodes=df.select(F.col(id_col).alias("node")),
    )
    return comp.select(
        F.col("node").alias(id_col),
        F.col("label").alias("component"),
        (F.col("node") == F.col("label")).alias("is_keeper"),
    )
