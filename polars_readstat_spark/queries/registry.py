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
    # round 5: every query now has a green driver row somewhere in
    # r01∪r02∪r04 (r04 covered the full never-checked tail), so this
    # window refreshes STALENESS: changed-this-round queries first,
    # then the 30 queries whose newest row is from round 2 — which
    # includes every r01-era writer roundtrip not re-checked since the
    # executor-packing rewrite of all single-file writers — then the
    # oldest round-3 block to fill the driver's 50-row window.
    "source_cap_topk",  # new in r05
    "mixture_budget_fill",  # new in r05
    "q11_important_value_share",  # de-vacuated at sf0.1: 1.5x-mean threshold
    "q22_idle_customer_balance",  # de-vacuated: recency NOT EXISTS
    # -- newest row is r02 (30) --
    "scan_dta_roundtrip",
    "scan_sav_roundtrip",
    "scan_zsav_roundtrip",
    "scan_xpt_roundtrip",
    "scan_por_roundtrip",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "cube_status_priority",
    "projection_pushdown",
    "filter_pushdown",
    "limit_pushdown",
    "offset_slice",
    "schema_override_cast",
    "metadata_merge_full_join",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "broadcast_join_order_region",
    "union_distinct_keys",
    "topk_orders_per_customer",
    "max_strlen_prepass",
    "group_count_events",
    "pivot_user_event_counts",
    "rollup_revenue_subtotals",
    "running_revenue_window",
    "q6_forecast_revenue",
    "intersect_except_user_sets",
    "customer_spend_quartiles",
    "orders_monthly_rollup",
    "row_index_ordered",
    "sort_by_index_roundtrip",
    # -- newest row is r03 (oldest 19 fill the window) --
    "q4_order_priority_exists",
    "q10_returned_item_revenue",
    "q14_promo_effect",
    "q18_large_volume_customer",
    "sample_hash_stratified",
    "scan_sas7bdat_types",
    "scan_sas7bdat_rle",
    "scan_sas7bdat_rdc",
    "scan_sas7bdat_bigendian",
    "scan_sas7bdat_mixpage",
    "scan_sas7bdat_roundtrip",
    "scan_sas7bdat_rle_roundtrip",
    "scan_sink_dir_roundtrip",
    "scan_dta_multifile",
    "scan_dta_pushdown",
    "scan_dta_metadata_surface",
    "scan_dta_value_labels",
    "scan_dta_informative_nulls",
    "ann_ivf_topk",
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
