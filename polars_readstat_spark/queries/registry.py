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
    # round 8 window: the ten r04-stale queries first (VERDICT r07
    # next#2 — their code paths changed when r7 threaded spread()
    # through the document pipelines, so the driver must re-confirm),
    "sequence_length_histogram",
    "sequence_packing_bins",
    "sessionization_30m",
    "simhash_band_pairs",
    "simhash_fingerprint",
    "source_mixing_weights",
    "text_lang_id_score",
    "text_quality_score",
    "text_token_count",
    "value_label_broadcast_decode",
    # then the queries whose code changed THIS round: the hot-key-safe
    # inverted index rewrite (VERDICT r07 next#4) and the ANN recall
    # floor asserts (next#8),
    "inverted_index_postings",
    "ann_ivf_recall",
    "ann_lsh_recall",
    # then the seven NEW round-8 queries (never driver-checked),
    "chunk_documents_overlap",
    "train_val_test_split",
    "vocab_oov_rate",
    "dedup_threshold_sweep",
    "dedup_cluster_size_histogram",
    "event_anomaly_days",
    "shuffle_key_skew_report",
    # then 30 of the 41 r05-green refreshes (alphabetical; the tail of
    # eleven spills past the window and rotates in next round; all
    # eleven re-verified in the local gate this round).
    "anti_join_customers_without_orders",
    "broadcast_join_order_region",
    "cube_status_priority",
    "customer_spend_quartiles",
    "filter_pushdown",
    "group_count_events",
    "intersect_except_user_sets",
    "limit_pushdown",
    "max_strlen_prepass",
    "metadata_merge_full_join",
    "mixture_budget_fill",
    "offset_slice",
    "orders_monthly_rollup",
    "pivot_user_event_counts",
    "projection_pushdown",
    "q10_returned_item_revenue",
    "q11_important_value_share",
    "q14_promo_effect",
    "q18_large_volume_customer",
    "q22_idle_customer_balance",
    "q3_shipping_priority",
    "q4_order_priority_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "rollup_revenue_subtotals",
    "row_index_ordered",
    "running_revenue_window",
    "sample_hash_stratified",
    "scan_dta_metadata_surface",
    "scan_dta_pushdown",
    # positions 51+: the r05 spill-over, then everything else keeps
    # registration order (r06/r07 greens — freshest, lowest priority).
    "scan_sas7bdat_bigendian",
    "scan_sas7bdat_mixpage",
    "scan_sas7bdat_rdc",
    "scan_sas7bdat_rle",
    "scan_sas7bdat_types",
    "schema_override_cast",
    "semi_join_customers_with_orders",
    "sort_by_index_roundtrip",
    "source_cap_topk",
    "topk_orders_per_customer",
    "union_distinct_keys",
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
