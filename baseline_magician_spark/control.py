"""Execution control & observability — SURVEY §2.11 (C1-C8) and the
query-settings passthrough surface (C5/O12).

The ClickHouse driver exposes 160+ per-query settings
(ch/query_settings.go:28-217) plus cancellation (ch/clickhouse.go:
304-339), progress packets (ch/clickhouse_progress.go:3-14) and query
IDs (ch/stmt.go:24-29). The Spark-native equivalents:

- settings -> ``spark.conf`` (runtime-settable SQL confs) or cluster
  configs; :data:`QUERY_SETTINGS_MAP` documents the mapping and
  :func:`apply_query_settings` applies the runtime-settable subset.
- cancellation -> job groups + ``cancelJobGroup`` watchdog.
- query id -> job group id (shows in the Spark UI, C8).
- progress -> ``StatusTracker`` polling (C2/C3).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

# ClickHouse setting -> (spark conf key | None, note). None = no direct
# runtime conf; the note says what covers it. Sites: ch/query_settings.go.
QUERY_SETTINGS_MAP: dict[str, tuple[str | None, str]] = {
    # resource limits (query_settings.go:28-90)
    "max_memory_usage": (None, "executor memory + spill; automatic in Spark"),
    "max_execution_time": (None, "run_with_timeout watchdog (C1)"),
    "max_rows_to_read": (None, "express as LIMIT in the plan"),
    "max_threads": ("spark.sql.shuffle.partitions", "parallelism knob"),
    "max_block_size": ("spark.sql.parquet.columnarReaderBatchSize", "vector batch rows"),
    "min_insert_block_size_rows": ("spark.sql.files.maxRecordsPerFile", "write batching"),
    # spill thresholds (query_settings.go:86-90) — Spark spills automatically
    "max_bytes_before_external_group_by": (None, "hash-agg spill automatic"),
    "max_bytes_before_external_sort": (None, "UnsafeExternalSorter automatic"),
    # join limits (query_settings.go:108-109, 167, 175)
    "max_rows_in_join": (None, "no hard cap; AQE skew-split instead"),
    "join_use_nulls": (None, "outer-join nulls are standard SQL in Spark"),
    # distributed/aggregation behavior
    "distributed_aggregation_memory_efficient": (None, "partial aggs always on"),
    "aggregation_memory_efficient_merge_threads": (None, "n/a"),
    # compression (bootstrap.go:156-158; compress_settings.go:13-20)
    "network_compression_method": ("spark.io.compression.codec", "lz4 default"),
    # timeouts (bootstrap.go:29-33)
    "receive_timeout": ("spark.network.timeout", "io timeout"),
    "send_timeout": ("spark.network.timeout", "io timeout"),
    # optimizer passthroughs (query_settings.go:138-141, 181)
    "enable_optimize_predicate_expression": (None, "PushDownPredicates always on"),
    "optimize_move_to_prewhere": (None, "parquet row-group stats skipping"),
    "compile_expressions": ("spark.sql.codegen.wholeStage", "codegen toggle"),
}

# Spark confs with boolean types: CH 0/1 values are coerced to
# 'true'/'false' before set (Spark validates these at set time)
_BOOLEAN_CONFS = {"spark.sql.codegen.wholeStage"}


def apply_query_settings(
    spark: SparkSession, settings: dict[str, object]
) -> dict[str, object]:
    """Apply the mappable subset to ``spark.conf``; returns the settings
    that have no runtime conf (caller decides whether that's an error —
    the CH driver silently forwards unknown settings too,
    ch/clickhouse_send_query.go)."""
    unmapped: dict[str, object] = {}
    for key, value in settings.items():
        conf_key, _note = QUERY_SETTINGS_MAP.get(key, (None, "unknown"))
        if conf_key is None:
            unmapped[key] = value
        else:
            # CH settings express booleans as 0/1; Spark validates
            # boolean-typed confs at set time and rejects "1"
            if conf_key in _BOOLEAN_CONFS:
                value = str(value).strip().lower() in ("1", "true", "yes")
                value = "true" if value else "false"
            spark.conf.set(conf_key, str(value))
    return unmapped


@contextmanager
def job_group(spark: SparkSession, query_id: str, description: str = ""):
    """Tag every job launched in the block with ``query_id`` (the CH
    query-id-injection equivalent, ch/stmt.go:24-29; C8). The id is the
    cancellation handle and the Spark UI group label."""
    sc = spark.sparkContext
    sc.setJobGroup(query_id, description or query_id, interruptOnCancel=True)
    try:
        yield query_id
    finally:
        sc.setJobGroup("", "")


class QueryCancelled(RuntimeError):
    pass


def run_with_timeout(
    spark: SparkSession,
    action: Callable[[], object],
    timeout_seconds: float,
    query_id: str = "query-with-timeout",
):
    """Run a blocking DataFrame action with a cancellation watchdog —
    the context-timeout ClientCancel equivalent (ch/clickhouse.go:
    304-339, C1). Raises :class:`QueryCancelled` on timeout."""
    sc = spark.sparkContext
    done = threading.Event()
    timed_out = threading.Event()

    def watchdog():
        if not done.wait(timeout_seconds):
            timed_out.set()
            sc.cancelJobGroup(query_id)

    t = threading.Thread(target=watchdog, daemon=True)
    with job_group(spark, query_id, f"timeout={timeout_seconds}s"):
        t.start()
        try:
            result = action()
        except Exception as e:
            if timed_out.is_set():
                raise QueryCancelled(
                    f"query {query_id!r} cancelled after {timeout_seconds}s"
                ) from e
            raise
        finally:
            done.set()
    if timed_out.is_set():
        raise QueryCancelled(f"query {query_id!r} cancelled after {timeout_seconds}s")
    return result


@dataclass
class ProgressSample:
    """One poll of the status tracker — the ServerProgress packet
    equivalent (ch/clickhouse_progress.go:3-14, handled ch/rows.go:
    98-106; C2/C3)."""

    active_stages: int
    active_tasks: int
    completed_tasks: int
    failed_tasks: int


@dataclass
class ProgressMonitor:
    """Poll StatusTracker while a query runs:

        with ProgressMonitor(spark) as mon:
            df.collect()
        mon.samples  # list[ProgressSample]
    """

    spark: SparkSession
    interval_seconds: float = 0.25
    samples: list[ProgressSample] = field(default_factory=list)

    def __enter__(self):
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def _poll(self):
        tracker = self.spark.sparkContext.statusTracker()
        while not self._stop.is_set():
            active, tasks, completed, failed = 0, 0, 0, 0
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info is None:
                    continue
                active += 1
                tasks += info.numActiveTasks
                completed += info.numCompletedTasks
                failed += info.numFailedTasks
            self.samples.append(ProgressSample(active, tasks, completed, failed))
            time.sleep(self.interval_seconds)

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        return False
