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
    # round 6: r05's window re-greened the r02-stale writer-roundtrip
    # block, so rotation continues by staleness — queries whose code
    # paths changed this round first (POR parser-proof pin, sas7bdat
    # two-stage merge guard, zsav sink abort), then the full 28-query
    # r03-stale block (TPC-H tail, text suite, time-series, ann — the
    # oldest greens in the union), then the rows-only multimodal
    # check, then the oldest r04 block to fill the driver's 50-row
    # window. After this round no query's newest green predates r04.
    # -- new in r06 (never driver-checked) --
    "scan_sav_compressed_roundtrip",
    "boilerplate_ngram_filter",
    "bpe_merge_candidates",
    # -- code paths changed this round --
    "scan_por_roundtrip",
    "scan_sas7bdat_roundtrip",
    "scan_sas7bdat_rle_roundtrip",
    "scan_zsav_roundtrip",
    # -- newest row is r03 (28) --
    "ann_ivf_topk",  # also perf-reworked this round
    "ann_lsh_recall",
    "asof_join_purchase_click",
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
    "scan_dta_informative_nulls",
    "scan_dta_value_labels",
    "text_bpe_token_count",
    "text_gopher_quality_rules",
    "text_ngram_topk",
    "text_rare_token_ratio",
    "window_lag_delta",
    # -- rows-only by design, kept fresh --
    "multimodal_decode_embed",
    # -- newest row is r04 (oldest 17 fill the window) --
    "ann_bruteforce_topk",
    "ann_lsh_topk",
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
    "dedup_incremental_vs_index",
    "dedup_keep_best_quality",
    "dedup_keep_first_records",
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
