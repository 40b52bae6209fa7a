"""DataFrame-level similarity search (the user-facing ANN library).

The registry queries in queries/similarity.py use a scaled-integer
representation so results replay bit-for-bit in the DuckDB oracle;
this module is the practical interface: plain double-precision cosine
over `array<float>` columns, tunable top-k, and the same three
strategies the queries pin down:

    top = cosine_topk(corpus, probes, "vec_id", "embedding", k=10)
    top = cosine_topk_lsh(corpus, probes, "vec_id", "embedding",
                          planes=64, bands=4)

Scale shapes: brute force broadcasts the probe set over one corpus
scan (no corpus shuffle) — right when |probes| is small; the LSH path
band-joins probe and corpus codes so per-probe candidates are bucket-
bounded — right when both sides are large. All expressions are
Catalyst higher-order functions (zip_with/aggregate): JVM-side, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c: str):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: for every probe row, the k nearest corpus
    rows (excluding itself). Returns (q_id, c_id, cosine, rk).

    The probe table is broadcast; the corpus is scanned once with no
    shuffle before the per-probe top-k window. Use for small probe
    sets (ad-hoc lookups, evaluation sets)."""
    q = probes.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(vec_col).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "c_id",
            (_dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _band_codes(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """(id, band_idx, band_key): sign-random-projection band codes.

    The hyperplane matrix is an inline literal (planes × dims ints from
    the deterministic LCG in functions/similarity.py, offset by seed);
    projections are higher-order-function sums — one pass over the
    vector array per row, JVM-side.
    """
    from polars_readstat_spark.functions.similarity import lsh_coef

    dims = df.select(F.size(vec_col).alias("n")).limit(1).collect()[0].n
    coef_rows = ", ".join(
        "array("
        + ", ".join(str(lsh_coef(p + seed, d)) for d in range(dims))
        + ")"
        for p in range(planes)
    )
    sums = (
        f"transform(array({coef_rows}), row -> "
        f"aggregate(zip_with(row, {vec_col}, "
        "(c, x) -> CAST(c AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    bpb = planes // bands
    parts = []
    for b in range(bands):
        bits = ", ".join(
            f"CASE WHEN element_at(_sums, {b * bpb + i + 1}) >= 0 "
            "THEN '1' ELSE '0' END"
            for i in range(bpb)
        )
        parts.append(f"{b}, concat({bits})")
    stack = f"stack({bands}, " + ", ".join(parts) + ") AS (band_idx, band_key)"
    return (
        df.select(F.col(id_col), F.expr(sums).alias("_sums"))
        .selectExpr(id_col, stack)
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int | None = None,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via sign-random-projection LSH:
    probe and corpus vectors are coded into `bands` band keys of
    `planes/bands` sign bits; candidates share at least one band key,
    and exact cosine + top-k runs on candidates only. Recall rises
    with bands, candidate volume falls with planes/bands (see
    SCALE.md's measured table). Returns (q_id, c_id, cosine, rk).
    """
    from polars_readstat_spark.functions.similarity import recommended_lsh

    if planes is None:
        planes, bands = recommended_lsh(corpus.count(), bands)
    cb = _band_codes(corpus, id_col, vec_col, planes, bands, seed)
    qb = _band_codes(probes, id_col, vec_col, planes, bands, seed).select(
        F.col(id_col).alias("q_id"), "band_idx", "band_key"
    )
    cand = (
        qb.join(cb.withColumnRenamed(id_col, "c_id"), ["band_idx", "band_key"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id")
        .dropDuplicates()
    )
    q = probes.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(vec_col).alias("c_norm"),
    )
    scored = (
        cand.join(q, "q_id")
        .join(c, "c_id")
        .select(
            "q_id",
            "c_id",
            (_dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm"))).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def ivf_build(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int = 256,
    kmeans_iters: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: k-means centroids (functions/kmeans.py
    Lloyd fit) + the inverted-list assignment table (id, cluster).

    Returns (assignments, centroids). The assignment table is the
    index — persist or write it once, then serve probes through
    ``cosine_topk_ivf``. Sizing: n_lists ~ sqrt(n) keeps candidate
    fetches at nprobe·sqrt(n) per probe."""
    from polars_readstat_spark.functions.kmeans import kmeans_fit

    assignments, centroids, _ = kmeans_fit(
        corpus, id_col, vec_col, k=n_lists, max_iters=kmeans_iters
    )
    return assignments, centroids


def cosine_topk_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    assignments: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat search: each probe scores only the inverted lists of
    its ``nprobe`` nearest centroids. Returns (q_id, c_id, cosine, rk).

    Shapes: centroid ranking is map-only (literal centroid matrix in
    codegen, same as assignment); candidate fetch is an equi-join on
    the cluster id — per-probe work is nprobe·n/n_lists instead of n,
    and nothing O(corpus) is broadcast."""
    from polars_readstat_spark.functions.kmeans import _dist2_expr

    dists = F.array(*[_dist2_expr(vec_col, c) for c in centroids])
    ranked = F.transform(
        F.array_sort(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    q = probes.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(F.slice(ranked, 1, nprobe)).alias("cluster"),
    )
    cand = q.join(
        assignments.withColumnRenamed(id_col, "c_id"), "cluster"
    ).filter(F.col("c_id") != F.col("q_id"))
    scored = cand.join(
        corpus.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_id",
    ).select(
        "q_id",
        "c_id",
        (
            _dot("q_vec", "c_vec") / (_norm("q_vec") * _norm("c_vec"))
        ).alias("cosine"),
    ).dropDuplicates(["q_id", "c_id"])
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
