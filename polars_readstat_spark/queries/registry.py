"""Registry wiring SURVEY.md §2 operators to (Spark query, DuckDB oracle) pairs.

Each implemented operator registers a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI
SQL string DuckDB runs over the same parquet tables. The driver
compares row-count + schema + order-insensitive value hash, sorting
columns by name — so every computed column is aliased identically on
both sides, and output types are restricted to
int/bigint/double/string/date/boolean (timestamps are emitted as epoch
seconds or dates: Spark collects tz-aware µs timestamps while DuckDB
yields naive ones, which would spuriously hash-mismatch).

Float determinism: monetary aggregates go through DECIMAL so the
aggregation is exact and order-independent (Spark sums doubles in
partition-completion order; a double sum would wobble in the last ulp),
then cast to double at the end — both engines do correctly-rounded
decimal→binary conversion, so the hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a named query and its optional DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver samples a fixed-size prefix of the registry — it takes
# the FIRST 50 rows, whatever the registry's total size (that is the
# invariant; don't record snapshots of the count here, they go stale).
# Insertion order is therefore load-bearing: each round, list first
# (a) any query whose code path changed this round, then (b) the
# queries whose newest driver-green row is oldest, so no query's
# independent verification drifts more than a couple of rounds behind
# its code. Queries past position 50 still run in the local gate
# (tools/check_correctness.py covers the whole registry).
_PRIORITY: tuple[str, ...] = (
    # round 13 window, part 1 — never driver-checked, all on this
    # round's changed paths: the hazard-free `where` option
    # (scan_where_option), per-stripe intra-file zone maps
    # (scan_zonemap_stripe_prune), and the r12-new file-level string
    # zone-map probe that missed the r12 window
    # (scan_zonemap_prune; VERDICT r12 missing#1). Order computed by
    # tools/rotation_plan.py from the CORRECTNESS_r*.json union.
    "scan_where_option",
    "scan_zonemap_stripe_prune",
    "scan_zonemap_date_prune",
    "scan_zonemap_index_prune",
    "scan_zonemap_bloom_prune",
    "scan_hive_layout_prune",
    "scan_zonemap_prune",
    # part 2: the 33 queries whose newest driver green is r09 — they
    # hit the 4-round staleness boundary this round (VERDICT r12
    # next#1); after this window lands no query's newest driver
    # green predates r10.
    "compress_all_midnight",
    "compress_string_numeric_parse",
    "decontaminate_ngram_overlap",
    "curation_funnel_stage_counts",
    "source_cap_topk",
    "chunk_documents_overlap",
    "corpus_clean_pipeline",
    "catalog_label_case_decode",
    "catalog_scan_formats",
    "schema_override_cast",
    "semi_join_customers_with_orders",
    "union_distinct_keys",
    "topk_orders_per_customer",
    "sample_quality_weighted",
    "scan_sas7bdat_types",
    "scan_sas7bdat_rle",
    "scan_sas7bdat_rdc",
    "scan_sas7bdat_bigendian",
    "scan_sas7bdat_mixpage",
    "scan_dta_roundtrip",
    "scan_dta_pushdown",
    "scan_dta_value_labels",
    "scan_dta_informative_nulls",
    "scan_sas7bdat_informative_nulls",
    "scan_dta_tagged_missing",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "bpe_merge_candidates",
    "lang_id_confusion",
    "asof_join_purchase_click",
    "decontaminate_hash_prefilter",
    # part 3: r10-greens filling the window to 50, sink/scan-family
    # first (the sink's manifest format and the reader's partition
    # pruning changed this round).
    "scan_sink_dir_roundtrip",
    "scan_sas7bdat_rle_roundtrip",
    "scan_sas7bdat_rdc_roundtrip",
    "scan_dta_multifile",
    "scan_federated_join",
    "row_index_ordered",
    "row_index_collision_guard",
    "sort_by_index_roundtrip",
    "dedup_exact_hash",
    "minhash_lsh_pairs",
    "simhash_band_pairs",
    "dedup_connected_components",
    "dedup_edit_distance_verify",
    "winnowing_fingerprints",
    # positions 51+ follow registration order (the remaining
    # r10/r11/r12-green families wait their turn; the local gate
    # still covers the whole registry each round).
)


def _prioritized(d: dict) -> dict:
    head = {n: d[n] for n in _PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return _prioritized(QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return _prioritized(ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module registers its queries
    from polars_readstat_spark.queries import (  # noqa: F401
        compress,
        curation,
        dedup,
        labels,
        multimodal,
        nulls,
        relational,
        retrieval,
        rowindex,
        sampling,
        sas7bdat_scan,
        scanio,
        similarity,
        text,
        timeseries,
        tpch,
    )

    _LOADED = True
