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
    # round 10 window, part 1: queries whose SEMANTICS or hot code
    # path changed this round — the relative winnowing cap (VERDICT
    # r09 next#4), the collision guard's result materialization
    # (next#6), the zsav per-block fetch latency seam + io_zsav_pool
    # arm (next#7), the mixed-format readahead single-wrap, the
    # metamemo tuple-freeze/eviction, and the rowindex literal-select.
    "winnowing_copy_pairs",
    "winnowing_fingerprints",
    "decontaminate_hash_prefilter",  # NEW this round (two-phase probe)
    "row_index_collision_guard",
    "row_index_ordered",
    "sort_by_index_roundtrip",
    "scan_zsav_roundtrip",
    "scan_sav_compressed_roundtrip",
    "scan_sav_roundtrip",
    "scan_dta_multifile",
    "scan_dta_multifile_readahead",
    "scan_union_by_name",
    "scan_dta_metadata_surface",
    "scan_por_roundtrip",
    "profile_read_surface",
    "scan_sas7bdat_roundtrip",
    "scan_sas7bdat_rle_roundtrip",
    "scan_sas7bdat_rdc_roundtrip",
    "scan_xpt_roundtrip",
    "scan_federated_join",
    "scan_sink_dir_roundtrip",
    "stream_ingest_agg",
    "dedup_connected_components",
    "dedup_exact_hash",
    "dedup_edit_distance_verify",
    "minhash_lsh_pairs",
    "simhash_band_pairs",
    # (scan_dta_roundtrip spilled to 51+ to make room for the new
    # decontaminate_hash_prefilter — it re-greened r9 and its read
    # path is covered in-window by scan_dta_multifile/_readahead)
    # part 2: the 23 r06-stale queries (VERDICT r09 missing#1 /
    # next#2 — their newest driver green is four rounds back; the
    # structural limit of a 50-row window over ~160 queries). After
    # this round no query's newest driver green predates r07.
    "embedding_quantize_int8",
    "event_value_histogram",
    "funnel_click_to_purchase",
    "kmeans_update_step",
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
    # positions 51+: first the FOUR queries new this round — the
    # three streaming oracle anchors and the shard shuffle (the
    # window is exactly full with the 23 r06-stale rotations VERDICT
    # r09 next#2 mandates — evicting any for a new query would break
    # that 'no green predates r07' contract; all four are local-gate
    # green now and front-of-window next round),
    "stream_sessionize_stateful",
    "stream_hourly_window",
    "stream_dedup_watermark",
    "training_shard_shuffle",
    # then the remaining changed-since-r9 scans (re-greened locally
    # this round; their driver green is r9 — freshest), then
    # everything else keeps registration order.
    "scan_sas7bdat_types",
    "scan_sas7bdat_rle",
    "scan_sas7bdat_rdc",
    "scan_sas7bdat_bigendian",
    "scan_sas7bdat_mixpage",
    "scan_sas7bdat_informative_nulls",
    "scan_dta_pushdown",
    "scan_dta_informative_nulls",
    "scan_dta_value_labels",
    "scan_dta_tagged_missing",
    "scan_xpt_informative_nulls",
    "catalog_label_case_decode",
    "catalog_scan_formats",
    "value_label_broadcast_decode",
    "sas_csv_import_roundtrip",
    "sas_csv_script_pins",
    "corpus_clean_pipeline",
    "dedup_cluster_size_histogram",
    "dedup_incremental_vs_index",
    "dedup_keep_best_quality",
    "dedup_keep_first_records",
    "minhash_signatures",
    "ngram_containment_sampled",
    "ngram_jaccard_sampled",
    "simhash_fingerprint",
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
