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
    # round 4: new-this-round queries first (no driver row can exist
    # yet), then the 10 queries that never received a driver row
    # through r01-r03, then the one red row from r03 (oracle typing,
    # fixed this round). Everything past those blocks already has a
    # green row in the r01∪r02∪r03 union.
    "scan_sas7bdat_informative_nulls",
    "scan_xpt_informative_nulls",
    "scan_dta_tagged_missing",
    "curation_funnel_stage_counts",
    "sequence_length_histogram",
    "q22_idle_customer_balance",
    "decontaminate_ngram_overlap",
    "sequence_packing_bins",
    "pii_pattern_counts",
    "dedup_keep_best_quality",
    "dedup_incremental_vs_index",
    "source_mixing_weights",
    "scan_sas7bdat_rdc_roundtrip",
    "retention_weekly_cohorts",
    "event_dau_wau_stickiness",
    # red in round 3 (uncast SUM -> HUGEINT in the oracle, fixed):
    # needs a fresh green row
    "event_props_json_extract",
    # greens that are oldest (round-1-only evidence) come next so the
    # remaining window refreshes the stalest rows first
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
