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
    # round 9 window: first the eleven r05-stale queries (VERDICT r08
    # next#2 — their newest driver green is three rounds back; the
    # sas7bdat fixture scans lead because the r9 reader refactor
    # touches their code path too),
    "scan_sas7bdat_types",
    "scan_sas7bdat_rle",
    "scan_sas7bdat_rdc",
    "scan_sas7bdat_bigendian",
    "scan_sas7bdat_mixpage",
    "schema_override_cast",
    "semi_join_customers_with_orders",
    "sort_by_index_roundtrip",
    "source_cap_topk",
    "topk_orders_per_customer",
    "union_distinct_keys",
    # then the queries whose code changed THIS round: the two new
    # registry entries (O4 collision guard, VERDICT r08 next#4; the
    # io_readahead multifile consumer, next#6), the NULL-text semantics
    # pin (ADVICE r08), and every scan whose read path the r9
    # range-fetch / fetch-decode-pipeline refactors touched (dta row
    # loop, sas7bdat page loop),
    "row_index_collision_guard",
    "scan_dta_multifile_readahead",
    "winnowing_fingerprints",
    "winnowing_copy_pairs",
    "sample_quality_weighted",
    "lang_id_confusion",
    "chunk_documents_overlap",
    "scan_dta_roundtrip",
    "scan_dta_multifile",
    "scan_dta_pushdown",
    "scan_dta_informative_nulls",
    "scan_dta_value_labels",
    "scan_dta_tagged_missing",
    "scan_sas7bdat_roundtrip",
    "scan_sas7bdat_rle_roundtrip",
    "scan_sas7bdat_rdc_roundtrip",
    "scan_sas7bdat_informative_nulls",
    "scan_union_by_name",
    "scan_sink_dir_roundtrip",
    "scan_federated_join",
    "stream_ingest_agg",
    "profile_read_surface",
    # then 17 of the 42 r06-green refreshes, now the oldest driver
    # greens (alphabetical; the tail spills past the window and
    # rotates in next round — all 42 stay covered by the local gate).
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "asof_join_purchase_click",
    "bpe_merge_candidates",
    "catalog_label_case_decode",
    "catalog_scan_formats",
    "compress_all_midnight",
    "compress_numeric_decision",
    "compress_string_numeric_parse",
    "corpus_clean_pipeline",
    "curation_funnel_stage_counts",
    "decontaminate_ngram_overlap",
    "dedup_connected_components",
    "dedup_edit_distance_verify",
    "dedup_embedding_cosine",
    "dedup_exact_hash",
    "embedding_quantize_int8",
    "event_value_histogram",
    "funnel_click_to_purchase",
    "kmeans_update_step",
    # positions 51+: the r06 spill-over (rotates in next round), then
    # everything else keeps registration order (r07/r08 greens —
    # freshest, lowest priority).
    "q12_linestatus_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_or_predicate_revenue",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "range_join_click_purchase_1h",
    "salted_skew_agg",
    "text_bpe_token_count",
    "text_gopher_quality_rules",
    "text_ngram_topk",
    "text_rare_token_ratio",
    "window_lag_delta",
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
