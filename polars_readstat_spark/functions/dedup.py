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
    from polars_readstat_spark.tables import spread

    # tokenize ONCE into a projected column: Catalyst does not hoist a
    # deterministic split() out of a higher-order-function lambda, so
    # inlining split(text) in the slice re-splits the text per shingle
    # index (O(len^2) per document — same defect fixed in the r13 gram
    # pipelines); spread() fans the narrow single-row-group scan across
    # cores before the per-row-heavy explode (no-op at the 100-TB
    # many-files shape where the scan already covers the cluster)
    shingles = (
        f"transform(sequence(1, greatest(size(__toks) - "
        f"{shingle_len - 1}, 1)), "
        f"i -> concat_ws(' ', slice(__toks, i, {shingle_len})))"
    )
    sh = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .withColumn("__toks", F.split(F.col(text_col), " "))
        .select(F.col(id_col), F.explode(F.expr(shingles)).alias("shingle"))
    )
    return sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(
                f"h{i}"
            )
            for i in range(k)
        ]
    )


def lsh_bands(
    sig: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Band table of a minhash signature table: (id, band_idx,
    band_key), `bands` rows per document. This is the joinable LSH
    index — self-join it for candidate pairs (lsh_candidate_pairs),
    or equi-join a new batch's bands against a persisted index's for
    incremental dedup. The signature must have at least
    bands*rows_per_band hash columns named h0..hN."""
    parts = []
    for b in range(bands):
        cols = [
            f"h{b * rows_per_band + r}" for r in range(rows_per_band)
        ]
        parts.append(f"{b}, md5(concat({', '.join(cols)}))")
    stack = (
        f"stack({bands}, {', '.join(parts)}) AS (band_idx, band_key)"
    )
    return sig.selectExpr(id_col, stack)


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
    bt = lsh_bands(sig, id_col, bands, rows_per_band)
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


def simhash_bits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
) -> DataFrame:
    """Per-document SimHash as a '0'/'1' bit string: (id, simhash).

    Classic Charikar fingerprint: each bit is the majority vote of the
    corresponding token-hash bit over the document's tokens — one
    explode plus one combinable aggregation. Bit b reads the high bit
    of hex nibble b%32 of a salted MD5 (salt = b//32, so fingerprints
    wider than one digest — e.g. the 64/96-bit production sizes
    ``recommended_simhash`` returns — just add salted hash columns),
    which any SQL engine can replay exactly.
    """
    if bits < 1:
        raise ValueError("simhash_bits: bits must be >= 1")
    nh = (bits + 31) // 32
    tok = df.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("t")
    ).select(
        id_col,
        F.md5("t").alias("h0"),
        *[
            F.md5(F.concat(F.lit(f"s{k}:"), F.col("t"))).alias(f"h{k}")
            for k in range(1, nh)
        ],
    )
    # hex → 8-nibble bigint words once, then each bit's tally is a
    # shift-and SUM — 2.5× faster than 32 substring+isin COUNTs at
    # sf0.1, bit-identical output (bit b reads nibble b's high bit,
    # i.e. nibble value ≥ 8, exactly as before)
    n_words = (bits + 7) // 8
    words = tok.select(
        id_col,
        *[
            F.conv(F.substring(f"h{(w * 8) // 32}", 1 + 8 * (w % 4), 8), 16, 10)
            .cast("bigint")
            .alias(f"w{w}")
            for w in range(n_words)
        ],
    )
    n = F.count(F.lit(1))
    cols = [
        F.when(
            F.sum(
                F.shiftright(
                    F.col(f"w{b // 8}"), 4 * (7 - (b % 8)) + 3
                ).bitwiseAND(F.lit(1))
            )
            * 2
            > n,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for b in range(bits)
    ]
    return words.groupBy(id_col).agg(F.concat(*cols).alias("simhash"))


def recommended_simhash(n_docs: int, max_hamming: int = 2) -> dict:
    """Size a simhash banding for ~corpus scale: pigeonhole-exact
    recall needs bands = max_hamming + 1, and expected bucket size
    n_docs / 2^band_width stays ≤ ~64 when band_width ≥
    log2(n_docs/64) — the same sizing rule as ``recommended_lsh``.
    Returns {bits, bands} to pass to simhash_bits /
    simhash_candidate_pairs. At 10⁹ docs: bands=3, width=24 → 72-bit
    fingerprint; candidate volume stays linear in the corpus."""
    import math

    bands = max_hamming + 1
    width = max(8, math.ceil(math.log2(max(n_docs, 128) / 64)))
    return {"bits": bands * width, "bands": bands}


def simhash_candidate_pairs(
    sim: DataFrame,
    id_col: str,
    bits: int = 16,
    bands: int = 2,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup pairs from banded SimHash: (id_a, id_b, hamming).

    The fingerprint is cut into ``bands`` equal slices; documents
    sharing any slice meet in an equi-join on (band_idx, band_val) —
    by the pigeonhole principle every pair within Hamming distance
    < ``bands`` shares at least one band, so recall is exact for
    max_hamming <= bands - 1 and the quadratic scan never happens.
    Survivors are verified with an exact bitwise Hamming distance.

    Scaling the band width is the knob: 64-bit fingerprints with 4×16
    bands keep buckets tiny at corpus scale; the 16-bit default here
    matches the registry's demonstration fingerprint.
    """
    nbits = bits
    if nbits < bands or nbits % bands:
        raise ValueError(
            "simhash_candidate_pairs: bits must be a positive multiple "
            "of bands"
        )
    width = nbits // bands
    bt = sim.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.substring("simhash", i * width + 1, width).alias(
                            "band_val"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.band_val")
    a, b = bt.alias("a"), bt.alias("b")
    ham = sum(
        F.when(
            F.substring(F.col("sa"), i + 1, 1)
            != F.substring(F.col("sb"), i + 1, 1),
            1,
        ).otherwise(0)
        for i in range(nbits)
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
        .select(
            "id_a", "id_b", ham.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
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
