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
    # round 14 window, part 1 — changed-path-first (VERDICT r13
    # next#3): the r13-vectorized writer kernels (POR base-30 token
    # ladder, shared string-cell pack for sav/zsav/xpt/sas7bdat) and
    # the round-14 export drain rework get their first driver greens
    # through the writer-backed roundtrips; the four streaming oracle
    # queries cover the bucketed sessionizer + Arrow drain (r13) and
    # any r14 sessionizer change. scan_sav_compressed_roundtrip rides
    # along: it exercises the bytecode decode path this round's read
    # instrumentation targets. Order computed by
    # tools/rotation_plan.py from the CORRECTNESS_r*.json union.
    "scan_por_roundtrip",
    "scan_sav_roundtrip",
    "scan_zsav_roundtrip",
    "scan_xpt_roundtrip",
    "scan_sas7bdat_roundtrip",
    "scan_sav_compressed_roundtrip",
    "scan_dta_roundtrip",
    "stream_sessionize_stateful",
    "stream_hourly_window",
    "stream_dedup_watermark",
    "stream_ingest_agg",
    # part 2: the 28 queries whose newest driver green is r10 — the
    # staleness frontier (rotation contract: no green older than 4
    # rounds); after this window lands no query's newest driver green
    # predates r11.
    "simhash_band_pairs",
    "dedup_connected_components",
    "dedup_edit_distance_verify",
    "winnowing_fingerprints",
    "winnowing_copy_pairs",
    "kmeans_update_step",
    "embedding_quantize_int8",
    "text_bpe_token_count",
    "text_ngram_topk",
    "text_rare_token_ratio",
    "text_gopher_quality_rules",
    "range_join_click_purchase_1h",
    "window_lag_delta",
    "salted_skew_agg",
    "event_value_histogram",
    "funnel_click_to_purchase",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q12_linestatus_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_or_predicate_revenue",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    # part 3: r11-greens filling the window to 50, oldest-first per
    # tools/rotation_plan.py registration order.
    "pii_pattern_counts",
    "pii_redact",
    "training_sequence_pack",
    "training_shard_shuffle",
    "dedup_keep_first_records",
    "minhash_signatures",
    "ngram_jaccard_sampled",
    "ngram_containment_sampled",
    "dedup_keep_best_quality",
    "dedup_incremental_vs_index",
    "multimodal_media_meta",
    # positions 51+ follow registration order (the remaining
    # r11/r12/r13-green families wait their turn; the local gate
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
