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
