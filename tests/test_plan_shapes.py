"""Physical-plan regression tests: the properties that make queries
scale are asserted, not assumed — filter/column pushdown into scans,
broadcast for dimensions, no stray shuffles, whole-stage codegen."""

from __future__ import annotations

import re

import pytest

from conftest import SF_ORACLE


def plan_of(df, execute: bool = False) -> str:
    if execute:
        # AQE finalizes the plan (incl. codegen markers) only after THIS
        # DataFrame's own queryExecution runs (count() would plan anew)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from baseline_magician_spark.registry import get_queries

    return get_queries()


def test_q1_pushdown_and_pruning(spark, queries):
    plan = plan_of(queries["q1_pricing_summary"](spark, SF_ORACLE), execute=True)
    # plan strings truncate long lines; match the visible prefix
    assert re.search(r"PushedFilters: \[IsNotNull\(l_shipdate\)", plan), (
        "shipdate filter not pushed to scan"
    )
    # column pruning: the scan's projected column list must not include
    # unused columns
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and "l_partkey" not in m.group(1)
    # whole-stage codegen spans show as *(n) operator prefixes
    assert re.search(r"\*\(\d+\) HashAggregate", plan), "agg not codegen'd"


def test_q3_broadcasts_dimensions(spark, queries):
    plan = plan_of(queries["q3_shipping_priority"](spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan  # all dims fit broadcast at sf0.01


def test_baseline_networks_broadcast_not_shuffled(spark, queries):
    plan = plan_of(queries["baseline_thresholds"](spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" in plan  # range join, networks side
    # the fact side must not shuffle before aggregation's partial pass
    agg_part = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning(network" in agg_part


def test_bucketed_join_is_hash_equi(spark, queries):
    plan = plan_of(queries["baseline_thresholds_bucketed_join"](spark, SF_ORACLE))
    # the networks join must be a hash equi-join on the prefix bucket
    # (the remaining nested-loop join is the scalar now_ts cross join)
    assert re.search(r"(Broadcast|Shuffled)HashJoin \[_bucket", plan)
    assert "BroadcastNestedLoopJoin BuildRight, Inner" not in plan


def test_minhash_selfjoin_single_band_shuffle(spark, queries):
    plan = plan_of(queries["dedup_minhash_lsh_pairs"](spark, SF_ORACLE))
    # shuffle_hash hint -> ShuffledHashJoin; the two identical band
    # projections must share one exchange subtree in the reused plan
    assert "ShuffledHashJoin" in plan


def test_multimodal_stays_narrow(spark, queries):
    plan = plan_of(queries["multimodal_decode_stats"](spark, SF_ORACLE))
    # decode is a pure map pipeline: no exchange anywhere
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
