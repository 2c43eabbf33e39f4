"""Execution-control layer: settings mapping, job-group tagging,
timeout cancellation, progress sampling."""

from __future__ import annotations

import time

import pytest


def test_apply_query_settings_maps_and_returns_unmapped(spark):
    from baseline_magician_spark.control import apply_query_settings

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        unmapped = apply_query_settings(
            spark,
            {
                "max_threads": 16,
                "max_bytes_before_external_sort": 1 << 30,
                "totally_unknown_setting": 1,
            },
        )
        assert spark.conf.get("spark.sql.shuffle.partitions") == "16"
        assert set(unmapped) == {
            "max_bytes_before_external_sort",
            "totally_unknown_setting",
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_job_group_tags_and_clears(spark):
    from baseline_magician_spark.control import job_group

    with job_group(spark, "qid-123", "test query"):
        assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") == "qid-123"
    assert spark.sparkContext.getLocalProperty("spark.jobGroup.id") in ("", None)


def test_run_with_timeout_cancels_long_job(spark):
    from baseline_magician_spark.control import QueryCancelled, run_with_timeout

    def slow(x):
        time.sleep(0.5)
        return x

    from pyspark.sql import functions as F

    slow_udf = F.udf(slow, "long")
    df = spark.range(0, 256, 1, 8).select(slow_udf("id").alias("v"))

    t0 = time.monotonic()
    with pytest.raises(QueryCancelled):
        run_with_timeout(spark, lambda: df.collect(), 2.0, "slow-query")
    # 256 rows x 0.5s / 8 threads = 16s uncancelled; must stop well short
    assert time.monotonic() - t0 < 10


def test_run_with_timeout_passes_result(spark):
    from baseline_magician_spark.control import run_with_timeout

    out = run_with_timeout(spark, lambda: spark.range(10).count(), 60.0, "fast")
    assert out == 10


def test_progress_monitor_samples(spark):
    from baseline_magician_spark.control import ProgressMonitor
    from pyspark.sql import functions as F

    with ProgressMonitor(spark, interval_seconds=0.05) as mon:
        (
            spark.range(0, 2_000_000, 1, 16)
            .groupBy((F.col("id") % 1024).alias("k"))
            .count()
            .count()
        )
    assert len(mon.samples) > 0
    assert max(s.completed_tasks + s.active_tasks for s in mon.samples) >= 0


def test_approx_stats_error_bounds(spark):
    """approx_count_distinct within 5% of exact; approx percentiles
    within the observed value range."""
    from conftest import SF_ORACLE
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.registry import get_queries
    from pyspark.sql import functions as F

    approx = {
        r.event_type: r
        for r in get_queries()["approx_distinct_and_quantiles"](
            spark, SF_ORACLE
        ).collect()
    }
    events = load_table(spark, SF_ORACLE, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.05 * e.users)
        assert e.lo <= a.p50_value <= e.hi
        assert e.lo <= a.p99_value <= e.hi
