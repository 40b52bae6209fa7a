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
    # round 12 window, part 1: the FIVE queries whose code path
    # changed this round — the multi-file planner now seeds child
    # datasources' resolved paths (zero per-file HEADs; moto smoke
    # finding), the union-by-name schema pass got the same seeding,
    # the compress sample plan too, the fs seam gained listdir
    # tolerance + the ArrowFS buffered front, and the sink's zone-map
    # manifest now records mtime_ns (plus the Arrow-native width
    # scan in convert_batches).
    "scan_dta_multifile_readahead",
    "scan_union_by_name",
    "compress_numeric_decision",
    "scan_fs_seam_roundtrip",
    "sink_remote_roundtrip",
    # part 2: the 45 queries whose newest driver green is r08 — the
    # staleness rotation (VERDICT r11 missing#1 / next#1: they hit
    # the 4-round boundary this round; after this window lands no
    # query's newest driver green predates r09).
    "ann_ivf_recall",
    "ann_lsh_recall",
    "anti_join_customers_without_orders",
    "broadcast_join_order_region",
    "cube_status_priority",
    "customer_spend_quartiles",
    "dedup_cluster_size_histogram",
    "dedup_threshold_sweep",
    "event_anomaly_days",
    "filter_pushdown",
    "group_count_events",
    "intersect_except_user_sets",
    "inverted_index_postings",
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
    "running_revenue_window",
    "sample_hash_stratified",
    "sequence_length_histogram",
    "sequence_packing_bins",
    "sessionization_30m",
    "shuffle_key_skew_report",
    "simhash_fingerprint",
    "source_mixing_weights",
    "text_lang_id_score",
    "text_quality_score",
    "text_token_count",
    "train_val_test_split",
    "value_label_broadcast_decode",
    "vocab_oov_rate",
    # positions 51+ follow registration order (the r09-r11-green
    # families wait their turn; the local gate still covers the
    # whole registry each round).
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
