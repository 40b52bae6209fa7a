"""Deterministic sampling / rebalancing queries over `documents`
(training-pipeline ops).

Hash-based sampling is the only kind that survives a distributed,
re-runnable pipeline: `rand()` changes across retries and partition
plans, but a content-hash threshold picks the same rows on any
cluster, any partitioning, any engine. The thresholds compare MD5 hex
strings lexicographically — '2' keeps ≈ 1/8 of uniform hashes, '8'
keeps ≈ 1/2 — which both Spark and DuckDB evaluate identically
(byte-wise ASCII compare), avoiding any hex→int conversion.

Reference analogue: the reference has no sampler (it is a file reader);
these are the added large-scale pipeline ops the engine needs at
100 TB, where a seeded `TABLESAMPLE` is not reproducible across jobs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table


@query(
    "sample_hash_stratified",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           MIN(doc_id) AS min_doc_id
    FROM documents
    WHERE MD5(text) < CASE WHEN lang = 'en' THEN '2' ELSE '8' END
    GROUP BY lang
    """,
)
def sample_hash_stratified(spark, sf_dir):
    """Stratified deterministic downsample: the language-rebalancing
    op — keep ~1/8 of the dominant language ('en') and ~1/2 of
    everything else, selected by a pure content-hash threshold.

    Scale shape: a single map-side filter (no shuffle, no state, no
    RNG); the same rows are kept on every run and every partitioning,
    so downstream incremental jobs see a stable sample. The summary
    aggregation here exists for the oracle comparison; the production
    form is the bare filter.
    """
    d = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", "2").otherwise("8")
    return (
        d.filter(F.md5("text") < threshold)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query(
    "sample_quality_weighted",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars, text,
             CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                  x -> x IN ('the','a','of','and','to','in','is','it')))
                  AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')) AS q
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (
      SELECT doc_id, n_chars,
             CASE WHEN q >= 0.04 THEN 'high'
                  WHEN q >= 0.02 THEN 'mid' ELSE 'low' END AS tier,
             CASE WHEN q >= 0.04 THEN 'c'
                  WHEN q >= 0.02 THEN '8' ELSE '4' END AS cut,
             MD5(text) AS h
      FROM t
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
           MIN(doc_id) AS min_doc_id
    FROM s WHERE h < cut GROUP BY tier
    """,
)
def sample_quality_weighted(spark, sf_dir):
    """Quality-weighted deterministic downsample: keep rate scales
    with a quality proxy (stopword hit rate → high/mid/low tiers kept
    at ~3/4, ~1/2, ~1/4 via hex-threshold compare on md5(text)) — the
    standard "sample good text at a higher rate" curation move, with
    NO RNG: membership is a pure function of the row, so re-runs,
    retries, and appended shards keep exactly the same documents
    (the property rand()-weighted sampling cannot give a distributed
    pipeline). Tier thresholds are exact string/double compares both
    engines evaluate identically.

    Scale shape: a single map-side expression + filter (no shuffle,
    no state); the per-tier rollup exists for the oracle. Production
    use keeps the bare filter and tunes tier cuts/rates per corpus.
    """
    # NULL-text pin (ADVICE r08 class): Spark scores split(NULL) as
    # (-1)/(-1)=1.0 while DuckDB yields NULL — drop on BOTH sides
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.split("text", " ")
    sw = F.array(
        *[F.lit(s) for s in ("the", "a", "of", "and", "to", "in", "is", "it")]
    )
    q = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
        "double"
    ) / F.size(toks)
    tier = (
        F.when(q >= 0.04, "high").when(q >= 0.02, "mid").otherwise("low")
    )
    cut = F.when(q >= 0.04, "c").when(q >= 0.02, "8").otherwise("4")
    return (
        d.select("doc_id", "n_chars", tier.alias("tier"), cut.alias("cut"), F.md5("text").alias("h"))
        .filter(F.col("h") < F.col("cut"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
