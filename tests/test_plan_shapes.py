"""Physical-plan shape assertions for the scale-critical queries.

Correctness is the oracle suite's job; this suite pins the *plans* —
the properties that decide whether a query survives a 100 TB / 1000-
executor scale-up: small dimensions broadcast (no shuffle of the big
side), aggregations combine map-side (partial_*), parquet scans prune
columns (ReadSchema), and nothing degenerates into a cartesian
product. If a refactor silently loses one of these, correctness tests
stay green but the cluster plan regresses — these tests catch that.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_SMALL

from polars_readstat_spark.queries import all_queries


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_broadcast_join_order_region_broadcasts_dims(spark):
    plan = plan_of(spark, "broadcast_join_order_region")
    assert "BroadcastHashJoin" in plan
    # the big fact side must not be exchanged for the dim join chain
    assert "CartesianProduct" not in plan


def test_semi_anti_joins_stay_semi(spark):
    semi = plan_of(spark, "semi_join_customers_with_orders")
    anti = plan_of(spark, "anti_join_customers_without_orders")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_q1_partial_aggregation_and_column_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # map-side combine: a partial HashAggregate below the shuffle
    assert "partial_" in plan
    # column pruning reaches the parquet scan: untouched wide columns
    # (l_comment is the big one) never leave the scan
    assert "l_comment" not in plan
    assert "ReadSchema" in plan


def test_projection_pushdown_prunes_scan(spark):
    plan = plan_of(spark, "projection_pushdown")
    assert "l_comment" not in plan


def test_filter_pushdown_reaches_parquet(spark):
    plan = plan_of(spark, "filter_pushdown")
    assert "PushedFilters: [" in plan
    # the predicate itself, not an empty pushdown list
    assert "PushedFilters: []" not in plan


def test_ann_bruteforce_broadcasts_probes(spark):
    plan = plan_of(spark, "ann_bruteforce_topk")
    # the corpus-vs-probe product must broadcast the probe side, never
    # shuffle or cartesian the corpus
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_lsh_is_equijoin_with_broadcast_verify(spark):
    plan = plan_of(spark, "ann_lsh_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dedup_embedding_cosine_is_equijoin(spark):
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_exact_hash_partial_agg(spark):
    plan = plan_of(spark, "dedup_exact_hash")
    assert "partial_" in plan


def test_minhash_lsh_reuses_band_table(spark):
    # the persisted band table must serve both sides of the self-join
    plan = plan_of(spark, "minhash_lsh_pairs")
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


@pytest.mark.parametrize(
    "name",
    ["value_label_broadcast_decode", "metadata_merge_full_join"],
)
def test_label_and_metadata_joins_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
