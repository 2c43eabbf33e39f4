"""Streaming hostgroup publication — the reference's periodic batch
refresh (run every ``calculaton_period``, README.md:18) as a continuous
query: windowed per-network aggregates flow through the SAME threshold
expressions and REST sink, published per micro-batch via foreachBatch.

Publish semantics mirror the reference's refresh: each trigger emits
the thresholds of the LATEST complete window only (the newest state
overwrites, like the batch job's delete-then-create). foreachBatch runs
on the driver, so the injectable REST transport needs no serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BaselineConfig
from ..plans.baseline import (
    ExpressionFn,
    apply_thresholds,
    mangle_hostgroup_name,
)
from ..sinks.hostgroups import HostgroupSink, hostgroup_rows
from ..sources.rest import Transport


def publish_hostgroups_stream(
    windowed_aggregates: DataFrame,
    expressions: dict[str, ExpressionFn],
    config: BaselineConfig,
    transport: Transport | None = None,
    checkpoint_dir: str | None = None,
):
    """Attach the hostgroup-publishing sink to a streaming aggregate
    (streaming_baseline_aggregate output: window_start, network,
    samples, metric columns). Returns the DataStreamWriter — caller
    picks the trigger and starts it."""
    sink = HostgroupSink(
        config.api_base_url, (config.api_user, config.api_password), transport
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        latest = batch_df.agg(F.max("window_start").alias("w")).first()["w"]
        if latest is None:
            return
        current = batch_df.where(F.col("window_start") == latest)
        out = apply_thresholds(current, expressions).withColumn(
            "hostgroup_name", mangle_hostgroup_name("network")
        )
        groups = hostgroup_rows(out)
        sink.publish(groups, [], remove_existing=False)

    writer = (
        windowed_aggregates.writeStream.foreachBatch(handle)
        .outputMode("update")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
