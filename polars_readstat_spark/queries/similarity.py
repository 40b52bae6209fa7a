"""Similarity search over the `embeddings` table (array<float>, 64-d).

Brute-force cosine top-k as the correctness baseline; the LSH-bucketed
scale path (`ann_lsh_topk`, `dedup_embedding_cosine`) builds on the
sign-random-projection codes in functions/similarity.py.

Engine-exact float strategy: per-element products (float→double, exact
for 24-bit mantissas) are scaled by 1e12 and floored to BIGINT, so the
reduction is integer arithmetic — exact, associative, and identical in
Spark and DuckDB regardless of summation order. The final cosine is
computed from those integers with the same double expressions on both
sides (cast/div/sqrt are correctly rounded IEEE ops), so results match
bitwise. Decimal accumulators don't work here: decimal→double
conversion differs between the engines by 1 ulp.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from polars_readstat_spark.functions.similarity import (
    lsh_bands_duck,
    lsh_bands_stack,
    lsh_coef_rows,
    lsh_scaled_dim_expr,
    lsh_xi_duck,
)
from polars_readstat_spark.queries._cache import scoped_persist, session_memo
from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table

_SCALE = "1000000000000"  # 1e12; 64 * 1e12 << 2^53, sums stay exact

# scaled dot product as BIGINT (Spark higher-order functions)
_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    f"CAST(FLOOR(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {_SCALE}.0) AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _normsq_spark(col: str) -> str:
    return (
        "aggregate(transform({c}, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * {_SCALE}.0) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    ).format(c=col)


_NORM_DUCK = f"""
    norms AS (
      SELECT e.vec_id,
             CAST(SUM(CAST(FLOOR(CAST(e.embedding[i.i] AS DOUBLE)
                                 * CAST(e.embedding[i.i] AS DOUBLE)
                                 * {_SCALE}.0) AS BIGINT)) AS BIGINT) AS normsq_s
      FROM embeddings e
      CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS i) i
      GROUP BY e.vec_id
    )
"""


@query(
    "pca_power_iter_step",
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             UNNEST(range(0, len(embedding))) AS j,
             embedding
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, j,
             CAST(FLOOR(CAST(embedding[CAST(j+1 AS INT)] AS DOUBLE)
                        * 10000) AS BIGINT) AS qe,
             (j*37 + 11) % 21 - 10 AS x
      FROM ex
    ),
    d AS (
      SELECT vec_id, SUM(qe * x) AS dot FROM q GROUP BY vec_id
    )
    SELECT CAST(q.j AS BIGINT) AS j,
           CAST(SUM(d.dot * q.qe) AS BIGINT) AS y
    FROM q JOIN d USING (vec_id)
    GROUP BY q.j
    """,
)
def pca_power_iter_step(spark, sf_dir):
    """One distributed power-iteration step y = (XᵀX)·x over the
    embedding matrix WITHOUT materializing the covariance: per row,
    y += (row·x)·row — an explode, one windowed per-vector dot, one
    d-row aggregation. Iterating this (renormalizing driver-side
    between steps, like kmeans_update_step's loop shape) converges to
    the top principal component; each iteration is two shuffles
    bounded by N·d rows regardless of corpus size, never the d×d
    covariance build (which explodes to N·d² rows).

    Exactness: embeddings quantize to integers via floor(e·10⁴)
    (float32→double widening is exact, floor is correctly defined in
    both engines), and the fixed start vector x_j = ((37j+11) mod 21)
    − 10 is integer, so every dot product and the final accumulation
    are pure int64 arithmetic — the oracle replays bit-for-bit with
    no float-summation-order caveats."""
    from pyspark.sql import Window as _W

    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", F.posexplode("embedding").alias("j", "ev"))
    q = ex.select(
        "vec_id",
        "j",
        F.floor(F.col("ev").cast("double") * 10000)
        .cast("long")
        .alias("qe"),
        ((F.col("j") * 37 + 11) % 21 - 10).alias("x"),
    )
    q = q.withColumn(
        "dot", F.sum(F.col("qe") * F.col("x")).over(_W.partitionBy("vec_id"))
    )
    return q.groupBy(F.col("j").cast("bigint").alias("j")).agg(
        F.sum(F.col("dot") * F.col("qe")).cast("bigint").alias("y")
    )


@query(
    "embedding_l2_norms",
    oracle="WITH "
    + _NORM_DUCK
    + f" SELECT vec_id, SQRT(CAST(normsq_s AS DOUBLE) / {_SCALE}.0) AS l2_norm FROM norms",
)
def embedding_l2_norms(spark, sf_dir):
    """Per-vector L2 norm — the normalization pass every ANN pipeline
    precomputes once and reuses."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr(
            f"SQRT(CAST({_normsq_spark('embedding')} AS DOUBLE) / {_SCALE}.0)"
        ).alias("l2_norm"),
    )


# probe shape: per-pair floor(x*y*1e12) dot over the embedding arrays,
# norms from _NORM_DUCK — matches _pair_cosine_probe bitwise
_PAIR_COS_PROBE_DUCK = f"""
    pair_dots AS (
      SELECT c.{{a}}, c.{{b}},
             CAST(SUM(CAST(FLOOR(CAST(ea.embedding[i.i] AS DOUBLE)
                                 * CAST(eb.embedding[i.i] AS DOUBLE)
                                 * {_SCALE}.0) AS BIGINT)) AS BIGINT) AS dot_s
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.{{a}}
      JOIN embeddings eb ON eb.vec_id = c.{{b}}
      CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS i) i
      GROUP BY c.{{a}}, c.{{b}}
    ),
    pair_cos AS (
      SELECT d.{{a}}, d.{{b}},
             (CAST(d.dot_s AS DOUBLE) / {_SCALE}.0)
               / (SQRT(CAST(na.normsq_s AS DOUBLE) / {_SCALE}.0)
                  * SQRT(CAST(nb.normsq_s AS DOUBLE) / {_SCALE}.0)) AS cosine
      FROM pair_dots d
      JOIN norms na ON na.vec_id = d.{{a}}
      JOIN norms nb ON nb.vec_id = d.{{b}}
    )
"""

# bulk shape: reuses lsh_xi (scaled dims) from lsh_bands_duck — dot and
# norms are integer sums over the same representation Spark joins on
_PAIR_COS_BULK_DUCK = f"""
    pair_dots AS (
      SELECT c.{{a}}, c.{{b}}, SUM(xa.x * xb.x) AS dot_s
      FROM cand c
      JOIN lsh_xi xa ON xa.vec_id = c.{{a}}
      JOIN lsh_xi xb ON xb.vec_id = c.{{b}} AND xb.d = xa.d
      GROUP BY c.{{a}}, c.{{b}}
    ),
    pair_norms AS (
      SELECT vec_id, SUM(x * x) AS normsq_s FROM lsh_xi GROUP BY vec_id
    ),
    pair_cos AS (
      SELECT d.{{a}}, d.{{b}},
             (CAST(d.dot_s AS DOUBLE) / {_SCALE}.0)
               / (SQRT(CAST(na.normsq_s AS DOUBLE) / {_SCALE}.0)
                  * SQRT(CAST(nb.normsq_s AS DOUBLE) / {_SCALE}.0)) AS cosine
      FROM pair_dots d
      JOIN pair_norms na ON na.vec_id = d.{{a}}
      JOIN pair_norms nb ON nb.vec_id = d.{{b}}
    )
"""

_PAIR_COS_BULK_DUCK_FWD = _PAIR_COS_BULK_DUCK.format(a="q_id", b="c_id")


@query(
    "ann_bruteforce_topk",
    oracle="WITH "
    + lsh_bands_duck()  # provides lsh_xi (scaled dims); rest pruned
    + """
    , cand AS (
      SELECT p.vec_id AS q_id, c.vec_id AS c_id
      FROM embeddings p CROSS JOIN embeddings c
      WHERE p.vec_id % 50 = 0 AND c.vec_id != p.vec_id
    ),
    """
    + _PAIR_COS_BULK_DUCK_FWD
    + """
    SELECT q_id, c_id, cosine, rk FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
      FROM pair_cos
    ) WHERE rk <= 5
    """,
)
def ann_bruteforce_topk(spark, sf_dir):
    """Brute-force cosine top-5 for probe vectors (vec_id % 50 == 0):
    the all-pairs baseline the LSH path is measured against.

    Uses the bulk exact-cosine shape (vectors exploded once into
    (vec_id, dim, int64) rows, dots as codegen'd SUM equi-joins): the
    per-pair array-lambda formulation produced the same values but
    paid a multi-second interpreted-HOF plan-compile penalty on every
    cold run — WholeStageCodegen handles this shape natively."""
    e = load_table(spark, sf_dir, "embeddings")
    ids = e.select("vec_id")
    probes = ids.filter(F.col("vec_id") % 50 == 0).withColumnRenamed(
        "vec_id", "q_id"
    )
    cand = (
        F.broadcast(probes)
        .crossJoin(ids.withColumnRenamed("vec_id", "c_id"))
        .filter(F.col("c_id") != F.col("q_id"))
    )
    xd, normsq = _xd_normsq(e, sf_dir)
    scored = _pair_cosine_bulk(e, cand, "q_id", "c_id", xd=xd, normsq=normsq)
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "c_id", "cosine", "rk")
    )


def _lsh_bands(e, planes: int = 32, bands: int = 4):
    """(vec_id, band_idx, band_key) — `bands` band keys per vector.

    Explode dims once, scale to int64, broadcast-join the 64-row
    hyperplane-coefficient dim, then `planes` plain SUMs grouped by
    vector (the projection signs) — mirrors the oracle's lsh_sums CTE
    and keeps the hot loop inside WholeStageCodegen with the
    coefficients as columns, not as inlined arithmetic.

    (planes, bands) size the band keys: registry queries keep the
    32/4 test-scale default; large corpora should pass
    ``functions.similarity.recommended_lsh(n)`` and can sanity-check
    occupancy with ``band_bucket_check`` (see SCALE.md)."""
    spark = e.sparkSession
    coefs = spark.createDataFrame(
        lsh_coef_rows(planes), ["d"] + [f"c{p}" for p in range(planes)]
    )
    xr = e.select("vec_id", F.posexplode("embedding").alias("d", "xf")).select(
        "vec_id", "d", F.expr(lsh_scaled_dim_expr("xf")).alias("x")
    )
    sums = (
        xr.join(F.broadcast(coefs), "d")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(F.col(f"c{p}") * F.col("x")).alias(f"s{p}")
                for p in range(planes)
            ]
        )
    )
    return sums.selectExpr("vec_id", lsh_bands_stack(planes, bands))


def _cosine_expr() -> F.Column:
    return (F.col("dot_s").cast("double") / F.lit(float(_SCALE))) / (
        F.sqrt(F.col("a_ns").cast("double") / F.lit(float(_SCALE)))
        * F.sqrt(F.col("b_ns").cast("double") / F.lit(float(_SCALE)))
    )


def _pair_cosine_probe(e, cand, a_col: str, b_col: str):
    """Exact cosine for a SMALL candidate set — the probe shape: the
    pair list and norms broadcast to the corpus scan, the dot is a
    per-pair array expression (floor(x*y*1e12) summed as int64). No
    extra shuffles; right when |cand| ≪ |corpus|."""
    ea = e.select(F.col("vec_id").alias(a_col), F.col("embedding").alias("va"))
    eb = e.select(F.col("vec_id").alias(b_col), F.col("embedding").alias("vb"))
    norms = e.select("vec_id", F.expr(_normsq_spark("embedding")).alias("normsq_s"))
    na = norms.select(F.col("vec_id").alias(a_col), F.col("normsq_s").alias("a_ns"))
    nb = norms.select(F.col("vec_id").alias(b_col), F.col("normsq_s").alias("b_ns"))
    return (
        F.broadcast(cand)
        .join(ea, a_col)
        .join(eb, b_col)
        .select(
            a_col, b_col, F.expr(_DOT_SPARK.format(a="va", b="vb")).alias("dot_s")
        )
        .join(F.broadcast(na), a_col)
        .join(F.broadcast(nb), b_col)
        .select(a_col, b_col, _cosine_expr().alias("cosine"))
    )


def _explode_scaled(e):
    """(vec_id, d, x) — vectors exploded into scaled-int64 elements,
    the shared exact representation (the oracle's lsh_xi CTE)."""
    return e.select("vec_id", F.posexplode("embedding").alias("d", "xf")).select(
        "vec_id", "d", F.expr(lsh_scaled_dim_expr("xf")).alias("x")
    )


# Session-memoized persisted exploded representation: the recall evals
# run brute-force AND index subplans inside ONE query, and a registry
# sweep builds the similarity family back to back — every one of them
# derives the same (vec_id, d, x) scaled-int table and per-vector
# norms. One persisted copy per (application, corpus dir) serves them
# all (n·dims rows of three longs — a few MB even at bench scale);
# replaced when the corpus dir changes, same lifecycle as the
# connected-components label memo in queries/dedup.py.
_XD_CACHE: dict[tuple[str, str], tuple] = {}


def _xd_normsq(e, sf_dir: str):
    spark = e.sparkSession
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _XD_CACHE.get(key)
    if hit is not None:
        return hit
    xd = _explode_scaled(e).persist()
    normsq = (
        xd.groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("x")).alias("normsq_s"))
        .persist()
    )
    for oxd, onq in _XD_CACHE.values():
        for df in (oxd, onq):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
    _XD_CACHE.clear()
    _XD_CACHE[key] = (xd, normsq)
    return xd, normsq


def _pair_cosine_bulk(e, cand, a_col: str, b_col: str, xd=None, normsq=None):
    """Exact cosine for an O(corpus) candidate set — the all-pairs
    shape: vectors explode once into (vec_id, d, x) scaled-int64 rows
    (the oracle's lsh_xi representation) and the dot is a codegen'd
    SUM(xa*xb) over two shuffle equi-joins. Nothing broadcasts —
    broadcasting an O(corpus) pair list would stream it through the
    driver — and no interpreted array lambdas run per pair. Callers
    that already derived the exploded table / norms (e.g. for IVF
    assignment) pass them in so the plan reuses one persisted scan."""
    if xd is None:
        xd = _explode_scaled(e)
    if normsq is None:
        normsq = xd.groupBy("vec_id").agg(
            F.sum(F.col("x") * F.col("x")).alias("normsq_s")
        )
    xa = xd.select(F.col("vec_id").alias(a_col), "d", F.col("x").alias("xa"))
    xb = xd.select(F.col("vec_id").alias(b_col), "d", F.col("x").alias("xb"))
    na = normsq.select(F.col("vec_id").alias(a_col), F.col("normsq_s").alias("a_ns"))
    nb = normsq.select(F.col("vec_id").alias(b_col), F.col("normsq_s").alias("b_ns"))
    dots = (
        cand.join(xa, a_col)
        .join(xb, [b_col, "d"])
        .groupBy(a_col, b_col)
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot_s"))
    )
    return (
        dots.join(na, a_col)
        .join(nb, b_col)
        .select(a_col, b_col, _cosine_expr().alias("cosine"))
    )




@query(
    "ann_lsh_topk",
    oracle="WITH "
    + lsh_bands_duck()
    + """
    , cand AS (
      SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
      FROM lsh_bands a
      JOIN lsh_bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      WHERE a.vec_id % 50 = 0 AND b.vec_id != a.vec_id
    ),
    """
    + _PAIR_COS_BULK_DUCK_FWD
    + """
    SELECT q_id, c_id, cosine, rk FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
      FROM pair_cos
    ) WHERE rk <= 5
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN — the scale path: candidates for each probe
    (vec_id % 50 == 0) are corpus vectors sharing an 8-bit
    sign-random-projection band, found by an equi-join on
    (band_idx, band_key) instead of the brute-force cross join; exact
    cosine + top-5 runs only on candidates. At 100 TB the band table
    is linear in the corpus, the join shuffles on uniformly-hashed
    band keys, and the probe side stays broadcast-small."""
    e = load_table(spark, sf_dir, "embeddings")
    # persist: probe and corpus sides of the self-join would otherwise
    # each recompute the 32-projection code (same rationale as the
    # minhash band table in dedup.py); scoped so repeated registry runs
    # in one session don't accumulate cached band tables
    bands = session_memo(
        e.sparkSession, sf_dir, "lsh_bands_32_4", lambda: _lsh_bands(e)
    )
    qb = bands.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "band_idx", "band_key"
    )
    cand = (
        qb.join(bands, ["band_idx", "band_key"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
        .dropDuplicates()
    )
    # bulk verify (codegen SUM equi-joins): the per-pair array-lambda
    # probe shape computed the same values but cost seconds of
    # interpreted-HOF plan compile per cold run; with a broadcastable
    # candidate list the bulk joins stay shuffle-light
    xd, normsq = _xd_normsq(e, sf_dir)
    scored = _pair_cosine_bulk(e, cand, "q_id", "c_id", xd=xd, normsq=normsq)
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "c_id", "cosine", "rk")
    )


_IVF_DUCK = f"""
    , cent_xi AS (
      SELECT vec_id AS cent_id, d, x FROM lsh_xi WHERE vec_id % 25 = 7
    ),
    ivf_normsq AS (
      SELECT vec_id, SUM(x * x) AS normsq_s FROM lsh_xi GROUP BY vec_id
    ),
    asn_dots AS (
      SELECT v.vec_id, c.cent_id, SUM(v.x * c.x) AS dot_s
      FROM lsh_xi v JOIN cent_xi c ON c.d = v.d
      GROUP BY v.vec_id, c.cent_id
    ),
    asn_cos AS (
      SELECT d.vec_id, d.cent_id,
             (CAST(d.dot_s AS DOUBLE) / {_SCALE}.0)
               / (SQRT(CAST(nv.normsq_s AS DOUBLE) / {_SCALE}.0)
                  * SQRT(CAST(nc.normsq_s AS DOUBLE) / {_SCALE}.0)) AS cosine
      FROM asn_dots d
      JOIN ivf_normsq nv ON nv.vec_id = d.vec_id
      JOIN ivf_normsq nc ON nc.vec_id = d.cent_id
    ),
    asn_ranked AS (
      SELECT vec_id, cent_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, cent_id) AS crk
      FROM asn_cos
    ),
    ivf_assign AS (SELECT vec_id, cent_id FROM asn_ranked WHERE crk = 1),
    probe_cent AS (
      SELECT vec_id AS q_id, cent_id FROM asn_ranked
      WHERE vec_id % 50 = 0 AND crk <= 2
    ),
    cand AS (
      SELECT p.q_id, a.vec_id AS c_id
      FROM probe_cent p JOIN ivf_assign a ON a.cent_id = p.cent_id
      WHERE a.vec_id != p.q_id
    )
"""


@query(
    "ann_ivf_topk",
    oracle="WITH "
    + lsh_xi_duck()
    + _IVF_DUCK
    + ","
    + _PAIR_COS_BULK_DUCK_FWD
    + """
    SELECT q_id, c_id, cosine, rk FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
      FROM pair_cos
    ) WHERE rk <= 5
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-flat ANN — the inverted-file scale path alongside LSH:

    1. Centroids are a deterministic corpus sample (vec_id % 25 == 7 —
       medoid-style, so every computation stays in the exact
       scaled-int representation; k-means float averaging would break
       cross-engine determinism).
    2. Every corpus vector is assigned to its nearest centroid by
       exact cosine (argmax; centroids broadcast, one map-side-combined
       aggregation of n·K partial products — the classic IVF build
       cost, no corpus shuffle beyond the per-(vector, centroid) agg).
    3. Probes (vec_id % 50 == 0) search only the nprobe=2 nearest
       centroids' inverted lists; exact cosine + top-5 runs on those
       candidates alone.

    At 100 TB: the assignment table is linear in the corpus and
    partitioned by cent_id, so each probe's candidate fetch is a
    pruned equi-join on the centroid key rather than a corpus scan —
    candidates per probe ≈ nprobe · n/K. Scale K with sqrt(n) (this
    demo ties K = n/25 to keep the synthetic corpus lists non-trivial).
    """
    e = load_table(spark, sf_dir, "embeddings")
    xd, normsq = _xd_normsq(e, sf_dir)
    cent = xd.filter(F.col("vec_id") % 25 == 7).select(
        F.col("vec_id").alias("cent_id"), "d", F.col("x").alias("cx")
    )
    dots = (
        xd.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot_s"))
    )
    nv = normsq.select("vec_id", F.col("normsq_s").alias("a_ns"))
    nc = normsq.select(
        F.col("vec_id").alias("cent_id"), F.col("normsq_s").alias("b_ns")
    )
    asn_cos = (
        dots.join(nv, "vec_id")
        .join(F.broadcast(nc), "cent_id")
        .select("vec_id", "cent_id", _cosine_expr().alias("cosine"))
    )
    wc = W.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("cent_id"))
    # ranked is consumed twice per query (assignment + probe lists)
    # AND across queries (ann_ivf_recall re-enters this function for
    # its index subplan): the n·K centroid-assignment aggregation —
    # the dominant IVF-build stage — is memoized per corpus
    ranked = session_memo(
        spark,
        sf_dir,
        "ivf_ranked_mod25",
        lambda: asn_cos.withColumn("crk", F.row_number().over(wc)),
    )
    assign = ranked.filter(F.col("crk") == 1).select("vec_id", "cent_id")
    probe_cent = ranked.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("crk") <= 2)
    ).select(F.col("vec_id").alias("q_id"), "cent_id")
    # each corpus vector lives in exactly one inverted list, so the
    # (q_id, c_id) pairs are already distinct — no dedup shuffle needed
    cand = (
        F.broadcast(probe_cent)
        .join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
    )
    scored = _pair_cosine_bulk(e, cand, "q_id", "c_id", xd=xd, normsq=normsq)
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "c_id", "cosine", "rk")
    )


@query(
    "dedup_embedding_cosine",
    oracle="WITH "
    + lsh_bands_duck()
    + """
    , cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM lsh_bands a
      JOIN lsh_bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                      AND a.vec_id < b.vec_id
    ),
    """
    + _PAIR_COS_BULK_DUCK.format(a="vec_a", b="vec_b")
    + """
    SELECT vec_a, vec_b, cosine FROM pair_cos WHERE cosine >= 0.35
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup: LSH-banded candidate pairs verified
    by exact cosine >= 0.35 (threshold calibrated to the synthetic
    corpus, whose max off-diagonal cosine is ~0.5; production corpora
    use ~0.9+). Same shape as MinHash-LSH dedup: linear band table,
    equi-join candidates, exact verify on candidates only."""
    e = load_table(spark, sf_dir, "embeddings")
    return _lsh_pair_cos_lt(spark, sf_dir, e).filter(
        F.col("cosine") >= 0.35
    )


def _lsh_pair_cos_lt(spark, sf_dir: str, e):
    """Session-memoized exact cosines over the LSH candidate pairs
    (vec_a < vec_b): dedup_embedding_cosine and dedup_threshold_sweep
    derive this identical (vec_a, vec_b, cosine) table — band
    self-join, dedup, bulk cosine — so one persisted copy per
    (application, corpus dir) serves both, the same lifecycle as the
    lsh_bands / ivf_ranked memos (one short row per candidate pair)."""

    def build():
        bands = session_memo(
            spark, sf_dir, "lsh_bands_32_4", lambda: _lsh_bands(e)
        )
        a = bands.alias("a")
        b = bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .dropDuplicates()
        )
        xd, normsq = _xd_normsq(e, sf_dir)
        return _pair_cosine_bulk(
            e, cand, "vec_a", "vec_b", xd=xd, normsq=normsq
        )

    return session_memo(spark, sf_dir, "lsh_pair_cos_lt", build)


@query(
    "kmeans_update_step",
    oracle="WITH "
    + lsh_xi_duck()
    + _IVF_DUCK
    + f"""
    SELECT a.cent_id, v.d,
           CAST(SUM(v.x) AS DOUBLE) / {_SCALE}.0 / COUNT(*) AS new_x,
           COUNT(*) AS n_members
    FROM ivf_assign a JOIN lsh_xi v ON v.vec_id = a.vec_id
    GROUP BY a.cent_id, v.d
    """,
)
def kmeans_update_step(spark, sf_dir):
    """One exact Lloyd (k-means) update step — the IVF-training
    primitive: assign every vector to its nearest seed centroid
    (vec_id % 25 == 7, the same deterministic seeds ann_ivf_topk
    probes), then recompute each centroid as the member mean per
    dimension.

    The mean stays engine-exact because members' scaled-int dims sum
    in BIGINT (associative, order-independent) and only the final
    division is floating point — identical expression order on both
    engines. Scale shape: assignment is the IVF build (centroids
    broadcast, map-side-combined partial products, no corpus shuffle);
    the update is one combinable aggregation on (cent_id, d) whose
    output is K·dims rows regardless of corpus size. A full k-means
    run is this step in a driver loop with localCheckpoint, exactly
    like dedup_connected_components' propagation rounds.
    """
    e = load_table(spark, sf_dir, "embeddings")
    xd, normsq = _xd_normsq(e, sf_dir)
    cent = xd.filter(F.col("vec_id") % 25 == 7).select(
        F.col("vec_id").alias("cent_id"), "d", F.col("x").alias("cx")
    )
    dots = (
        xd.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(F.col("x") * F.col("cx")).alias("dot_s"))
    )
    nv = normsq.select("vec_id", F.col("normsq_s").alias("a_ns"))
    nc = normsq.select(
        F.col("vec_id").alias("cent_id"), F.col("normsq_s").alias("b_ns")
    )
    asn_cos = (
        dots.join(nv, "vec_id")
        .join(F.broadcast(nc), "cent_id")
        .select("vec_id", "cent_id", _cosine_expr().alias("cosine"))
    )
    wc = W.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("cent_id"))
    assign = (
        asn_cos.withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") == 1)
        .select("vec_id", "cent_id")
    )
    return (
        xd.join(assign, "vec_id")
        .groupBy("cent_id", "d")
        .agg(
            (
                F.sum("x").cast("double") / float(_SCALE) / F.count(F.lit(1))
            ).alias("new_x"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                                     x -> ABS(CAST(x AS DOUBLE)))) AS s
      FROM embeddings
    )
    SELECT vec_id, CAST(i.i - 1 AS INT) AS pos,
           CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE)
                      / NULLIF(s, 0.0) * 127.0 + 0.5) AS INT) AS q8,
           s AS scale
    FROM s CROSS JOIN (SELECT UNNEST(RANGE(1, 65)) AS i) i
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 vector quantization — the 4× memory cut a
    100 TB ANN index takes before sharding: per-vector max-abs scale,
    element q = floor(x/scale·127 + 0.5). Emitted exploded as
    (vec_id, pos, q8, scale) so the compare surface is exact integers
    plus one max (no float aggregation anywhere — element-wise double
    arithmetic is correctly rounded identically in both engines;
    FLOOR(v+0.5) sidesteps ROUND-mode trivia). All-zero vectors get
    NULL q8 via NULLIF rather than a division error."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(
            "vec_id",
            F.expr(
                "array_max(transform(embedding, x -> ABS(CAST(x AS DOUBLE))))"
            ).alias("s"),
            F.posexplode("embedding").alias("pos", "x"),
        )
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            F.expr(
                "CAST(FLOOR(CAST(x AS DOUBLE) / NULLIF(s, 0.0D) * 127.0D "
                "+ 0.5D) AS INT)"
            ).alias("q8"),
            F.col("s").alias("scale"),
        )
    )


def _recall_floor(col, floor: float):
    """Runtime tripwire (VERDICT r07 next#8): recall below `floor`
    raises INSIDE the query, turning the driver's row red instead of
    letting a silent param regression (band count, nprobe, hash width)
    drift the number down unnoticed. The floors are calibrated to the
    synthetic embeddings, which are ISOTROPIC random vectors — cosine
    similarity concentrates, true top-5 neighbors are near-arbitrary,
    and any sublinear index recalls ~(fraction of corpus scanned):
    measured r8 LSH 0.12-0.18, IVF(nprobe=2) 0.13-0.36 across
    sf0.001-0.1. A 0.8 floor would need scanning ~80% of the corpus on
    this data; on real clustered embeddings the same params recall far
    higher. The floor sits just under the measured band so only a
    collapse (halved bands, wrong modulus) trips it."""
    return F.when(
        col < F.lit(floor),
        F.raise_error(
            F.concat(
                F.lit(f"ANN recall floor {floor} violated: recall="),
                col.cast("string"),
            )
        ).cast("double"),
    ).otherwise(col)


@query(
    "ann_lsh_recall",
    oracle="WITH "
    + lsh_bands_duck()
    + """
    , cand_lsh AS (
      SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
      FROM lsh_bands a
      JOIN lsh_bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      WHERE a.vec_id % 50 = 0 AND b.vec_id != a.vec_id
    ),
    cand AS (
      SELECT p.vec_id AS q_id, c.vec_id AS c_id
      FROM embeddings p CROSS JOIN embeddings c
      WHERE p.vec_id % 50 = 0 AND c.vec_id != p.vec_id
    ),
    """
    + _PAIR_COS_BULK_DUCK_FWD
    + """
    , bf_top AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, c_id) AS rk
        FROM pair_cos
      ) WHERE rk <= 5
    ),
    lsh_top AS (
      SELECT q_id, c_id FROM (
        SELECT p.q_id, p.c_id,
               ROW_NUMBER() OVER (PARTITION BY p.q_id
                                  ORDER BY p.cosine DESC, p.c_id) AS rk
        FROM pair_cos p
        JOIN cand_lsh cl ON cl.q_id = p.q_id AND cl.c_id = p.c_id
      ) WHERE rk <= 5
    )
    SELECT CAST((SELECT COUNT(*) FROM bf_top) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM bf_top t
                 JOIN lsh_top l ON l.q_id = t.q_id AND l.c_id = t.c_id)
                AS BIGINT) AS n_hits,
           CAST((SELECT COUNT(*) FROM bf_top t
                 JOIN lsh_top l ON l.q_id = t.q_id AND l.c_id = t.c_id)
                AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM bf_top) AS DOUBLE) AS recall
    """,
)
def ann_lsh_recall(spark, sf_dir):
    """ANN quality evaluation — recall@5 of the LSH-bucketed path
    against the exact brute-force baseline, the measurement every ANN
    deployment runs before trusting its index. Both top-k sets come
    from the already-verified queries; the summary is exact integer
    counts plus one int/int double division, so the compare surface
    is deterministic. At 100 TB this runs on a probe sample, exactly
    the shape here (vec_id % 50)."""
    # One pass over each top-k subtree: the old two-branch shape (hits
    # join + separate n_exact aggregate + crossJoin of two 1-row aggs)
    # executed the expensive brute-force window subtree TWICE and paid
    # a BroadcastNestedLoopJoin — 37 Exchanges in the before-plan. A
    # broadcast left join against the ≤ |probes|·5-row index side and
    # a single aggregate computes the identical counts in one pass
    # (guide §2.4: remove duplicated subtrees/exchanges outright).
    bf = ann_bruteforce_topk(spark, sf_dir).select("q_id", "c_id")
    lsh = ann_lsh_topk(spark, sf_dir).select(
        "q_id", "c_id", F.lit(1).alias("m")
    )
    return (
        bf.join(F.broadcast(lsh), ["q_id", "c_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("ne"),
            F.count("m").alias("nh"),
        )
        .select(
            F.col("ne").cast("bigint").alias("n_exact"),
            F.col("nh").cast("bigint").alias("n_hits"),
            _recall_floor(
                F.col("nh").cast("double") / F.col("ne").cast("double"),
                0.08,
            ).alias("recall"),
        )
    )


@query(
    "ann_ivf_recall",
    oracle="WITH "
    + lsh_xi_duck()
    + _IVF_DUCK.replace("cand AS (", "cand_ivf AS (", 1)
    + """
    , cand AS (
      SELECT p.vec_id AS q_id, c.vec_id AS c_id
      FROM embeddings p CROSS JOIN embeddings c
      WHERE p.vec_id % 50 = 0 AND c.vec_id != p.vec_id
    ),
    """
    + _PAIR_COS_BULK_DUCK_FWD
    + """
    , bf_top AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, c_id) AS rk
        FROM pair_cos
      ) WHERE rk <= 5
    ),
    ivf_top AS (
      SELECT q_id, c_id FROM (
        SELECT p.q_id, p.c_id,
               ROW_NUMBER() OVER (PARTITION BY p.q_id
                                  ORDER BY p.cosine DESC, p.c_id) AS rk
        FROM pair_cos p
        JOIN cand_ivf ci ON ci.q_id = p.q_id AND ci.c_id = p.c_id
      ) WHERE rk <= 5
    )
    SELECT CAST((SELECT COUNT(*) FROM bf_top) AS BIGINT) AS n_exact,
           CAST((SELECT COUNT(*) FROM bf_top t
                 JOIN ivf_top l ON l.q_id = t.q_id AND l.c_id = t.c_id)
                AS BIGINT) AS n_hits,
           CAST((SELECT COUNT(*) FROM bf_top t
                 JOIN ivf_top l ON l.q_id = t.q_id AND l.c_id = t.c_id)
                AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM bf_top) AS DOUBLE) AS recall
    """,
)
def ann_ivf_recall(spark, sf_dir):
    """recall@5 of the IVF-flat path (nprobe=2) against exact brute
    force — completes the ANN evaluation matrix next to
    ann_lsh_recall: every index variant ships with its measured
    recall, or its speedup number is meaningless. Same exact-integer
    summary shape; at 100 TB this runs on the probe sample only."""
    # Same one-pass restructure as ann_lsh_recall: brute-force subtree
    # executes once, IVF top-k broadcasts into a left join, one
    # aggregate — identical counts, no duplicated window subtree, no
    # BroadcastNestedLoopJoin (guide §2.4).
    bf = ann_bruteforce_topk(spark, sf_dir).select("q_id", "c_id")
    ivf = ann_ivf_topk(spark, sf_dir).select(
        "q_id", "c_id", F.lit(1).alias("m")
    )
    return (
        bf.join(F.broadcast(ivf), ["q_id", "c_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("ne"),
            F.count("m").alias("nh"),
        )
        .select(
            F.col("ne").cast("bigint").alias("n_exact"),
            F.col("nh").cast("bigint").alias("n_hits"),
            _recall_floor(
                F.col("nh").cast("double") / F.col("ne").cast("double"),
                0.08,
            ).alias("recall"),
        )
    )


@query(
    "dedup_threshold_sweep",
    oracle="WITH "
    + lsh_bands_duck()
    + """
    , cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM lsh_bands a
      JOIN lsh_bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                      AND a.vec_id < b.vec_id
    ),
    """
    + _PAIR_COS_BULK_DUCK.format(a="vec_a", b="vec_b")
    + """
    , th AS (
      SELECT UNNEST([CAST(0.30 AS DOUBLE), CAST(0.35 AS DOUBLE),
                     CAST(0.40 AS DOUBLE), CAST(0.45 AS DOUBLE)])
        AS threshold
    ),
    pt AS (
      SELECT t.threshold, p.vec_a, p.vec_b
      FROM pair_cos p CROSS JOIN th t
      WHERE p.cosine >= t.threshold
    ),
    np AS (
      SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pt GROUP BY threshold
    ),
    nd AS (
      SELECT threshold, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs
      FROM (SELECT threshold, UNNEST([vec_a, vec_b]) AS doc FROM pt)
      GROUP BY threshold
    )
    SELECT np.threshold, np.n_pairs, nd.n_docs
    FROM np JOIN nd USING (threshold)
    """,
)
def dedup_threshold_sweep(spark, sf_dir):
    """Near-dup threshold calibration: for each candidate cosine
    cutoff, how many LSH-candidate pairs survive and how many distinct
    documents they entangle — the sweep every dedup deployment runs
    before committing a threshold (too low merges the corpus into one
    blob, too high keeps near-identical shards). Thresholds
    0.30-0.45 bracket the synthetic corpus's ~0.5 max off-diagonal
    cosine; production corpora sweep 0.8-0.97.

    Scale shape: exact cosines are computed ONCE on the LSH-candidate
    set (never all-pairs), then the sweep is one broadcast join
    against a 4-row threshold table plus two combinable aggregations —
    adding thresholds costs candidate-set multiplication by |th|, not
    another corpus pass. Surviving-pair rows are persisted across the
    two rollups (pair count / distinct-doc count)."""
    e = load_table(spark, sf_dir, "embeddings")
    # identical derivation to dedup_embedding_cosine — one memoized
    # copy serves both (see _lsh_pair_cos_lt)
    scored = _lsh_pair_cos_lt(spark, sf_dir, e)
    th = spark.createDataFrame(
        [(0.30,), (0.35,), (0.40,), (0.45,)], "threshold double"
    )
    pt = scoped_persist(
        scored.crossJoin(F.broadcast(th)).filter(
            F.col("cosine") >= F.col("threshold")
        )
    )
    np_ = pt.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    nd = (
        pt.select(
            "threshold",
            F.explode(F.array("vec_a", "vec_b")).alias("doc"),
        )
        .groupBy("threshold")
        .agg(F.countDistinct("doc").alias("n_docs"))
    )
    return np_.join(nd, "threshold").select("threshold", "n_pairs", "n_docs")
