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


# The driver samples a fixed-size prefix of the registry (50 rows in
# round 2, while the registry has grown to 97 queries), so insertion
# order is load-bearing: queries that still lack a green CORRECTNESS
# row from a previous round are listed here and surfaced first —
# round-3 additions, then the round-2 red/unchecked set, then
# round-1-only greens needing refresh. Update per round as rows come
# back green.
_PRIORITY: tuple[str, ...] = (
    # new this round — no row could exist yet
    "scan_sas7bdat_roundtrip",
    "scan_sas7bdat_rle_roundtrip",
    "scan_sink_dir_roundtrip",
    "simhash_band_pairs",
    "text_rare_token_ratio",
    "embedding_quantize_int8",
    "multimodal_media_meta",
    "multimodal_decode_embed",
    "catalog_scan_formats",
    "q4_order_priority_exists",
    "q10_returned_item_revenue",
    "q14_promo_effect",
    "q18_large_volume_customer",
    "ann_lsh_recall",
    "text_gopher_quality_rules",
    "scan_sas7bdat_types",
    "scan_sas7bdat_rle",
    "scan_sas7bdat_rdc",
    "scan_sas7bdat_bigendian",
    "scan_sas7bdat_mixpage",
    # red in round 2 (oracle typing, fixed): needs a fresh row
    "sample_hash_stratified",
    # never driver-checked through round 2
    "scan_dta_multifile",
    "scan_dta_pushdown",
    "scan_dta_metadata_surface",
    "scan_dta_value_labels",
    "scan_dta_informative_nulls",
    "ann_ivf_topk",
    "kmeans_update_step",
    "text_bpe_token_count",
    "text_ngram_topk",
    "asof_join_purchase_click",
    "range_join_click_purchase_1h",
    "window_lag_delta",
    "salted_skew_agg",
    "event_value_histogram",
    "event_props_json_extract",
    "funnel_click_to_purchase",
    # new TPC-H completions (round 3, second batch) — after the
    # never-checked set; whatever falls past the driver's 50-row
    # window picks up its row next round
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_value_share",
    "q12_linestatus_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_or_predicate_revenue",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    "q22_idle_customer_balance",
    # corpus-curation additions (round 3, second batch)
    "decontaminate_ngram_overlap",
    "sequence_packing_bins",
    "pii_pattern_counts",
    "dedup_keep_best_quality",
    "dedup_incremental_vs_index",
    "source_mixing_weights",
    "scan_sas7bdat_rdc_roundtrip",
    "retention_weekly_cohorts",
    "event_dau_wau_stickiness",
    # green in round 1 only — refresh driver evidence
    "embedding_l2_norms",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "dedup_embedding_cosine",
    "text_token_count",
    "text_quality_score",
    "text_lang_id_score",
    "doc_fingerprint",
    "event_hourly_window",
    "sessionization_30m",
    "event_value_quantiles",
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
