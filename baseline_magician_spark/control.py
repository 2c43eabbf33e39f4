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
#
# Every name in the driver's full passthrough list
# (ch/query_settings.go:28-217, 190 settings) classifies through
# classify_setting(): either an explicit entry here or a category rule
# below — there is no "unknown" for reference settings.
QUERY_SETTINGS_MAP: dict[str, tuple[str | None, str]] = {
    # --- resource limits (query_settings.go:83-120) ---
    "max_memory_usage": (None, "executor memory + automatic spill"),
    "max_memory_usage_for_user": (None, "cluster-manager quota concern"),
    "max_memory_usage_for_all_queries": (None, "executor memory ceiling"),
    "max_execution_time": (None, "run_with_timeout watchdog (C1)"),
    "timeout_before_checking_execution_speed": (None, "watchdog grace period"),
    "min_execution_speed": (None, "no rows/s floor; speculative exec covers stragglers"),
    "max_execution_speed": (None, "no rows/s throttle in Spark"),
    "min_execution_speed_bytes": (None, "see min_execution_speed"),
    "max_execution_speed_bytes": (None, "see max_execution_speed"),
    "max_rows_to_read": (None, "express as LIMIT; scans stream, no hard cap"),
    "max_bytes_to_read": (None, "see max_rows_to_read"),
    "max_columns_to_read": (None, "column pruning makes over-read structural, not quota"),
    "max_rows_to_group_by": (None, "hash agg spills instead of erroring"),
    "max_rows_to_sort": (None, "external sort spills instead of erroring"),
    "max_bytes_to_sort": (None, "see max_rows_to_sort"),
    "max_result_rows": (None, "LIMIT in the plan"),
    "max_result_bytes": (None, "spark.driver.maxResultSize (static conf, bytes)"),
    "max_network_bandwidth": (None, "no per-query network throttle"),
    "max_network_bytes": (None, "no per-query network quota"),
    "max_network_bandwidth_for_user": (None, "see max_network_bandwidth"),
    "max_network_bandwidth_for_all_users": (None, "see max_network_bandwidth"),
    "max_temporary_columns": (None, "Catalyst projections are unbounded by design"),
    "max_temporary_non_const_columns": (None, "see max_temporary_columns"),
    "max_rows_in_set": (None, "IN-set materialization bounded by broadcast threshold"),
    "max_bytes_in_set": ("spark.sql.autoBroadcastJoinThreshold", "broadcast-side byte cap"),
    "max_rows_in_distinct": (None, "distinct = hash agg; spills, no cap"),
    "max_bytes_in_distinct": (None, "see max_rows_in_distinct"),
    "max_rows_to_transfer": (None, "external-table transfers are broadcast-bounded"),
    "max_bytes_to_transfer": ("spark.sql.autoBroadcastJoinThreshold", "broadcast cap"),
    "priority": (None, "fair-scheduler pool via sc.setLocalProperty('spark.scheduler.pool', ...)"),
    "readonly": (None, "no DDL/DML surface in this engine's query path"),
    # --- join limits (query_settings.go:108-109, 167, 175) ---
    "max_rows_in_join": (None, "no hard cap; AQE skew-split instead"),
    "max_bytes_in_join": ("spark.sql.autoBroadcastJoinThreshold", "build-side byte cap"),
    "join_use_nulls": (None, "outer-join nulls are standard SQL in Spark"),
    "join_any_take_last_row": (None, "ANY-join ~ dropDuplicates keep-policy in the plan"),
    # --- block/batch sizing (query_settings.go:29-35, 78-80) ---
    "min_compress_block_size": (None, "parquet page size (writer option parquet.page.size)"),
    "max_compress_block_size": (None, "parquet block size (writer option parquet.block.size)"),
    "max_block_size": ("spark.sql.parquet.columnarReaderBatchSize", "vector batch rows"),
    "max_insert_block_size": ("spark.sql.files.maxRecordsPerFile", "write batching"),
    "min_insert_block_size_rows": ("spark.sql.files.maxRecordsPerFile", "write batching"),
    "min_insert_block_size_bytes": (None, "see min_insert_block_size_rows"),
    "max_read_buffer_size": (None, "io buffer; parquet reader manages internally"),
    "preferred_block_size_bytes": ("spark.sql.files.maxPartitionBytes", "split sizing"),
    "preferred_max_column_in_block_size_bytes": (None, "vector batch sizing covers it"),
    "max_query_size": (None, "parser has no text-size cap"),
    "interactive_delay": (None, "progress poll interval (ProgressMonitor.interval_seconds)"),
    "poll_interval": (None, "see interactive_delay"),
    # --- spill thresholds (query_settings.go:86-90) ---
    "max_bytes_before_external_group_by": (None, "hash-agg spill automatic"),
    "max_bytes_before_external_sort": (None, "UnsafeExternalSorter automatic"),
    "max_bytes_before_remerge_sort": (None, "sort merge handled internally"),
    # --- aggregation behavior ---
    "distributed_aggregation_memory_efficient": (None, "partial aggs always on"),
    "aggregation_memory_efficient_merge_threads": (None, "merge parallelism = shuffle partitions"),
    "group_by_two_level_threshold": (None, "two-phase agg is the only mode"),
    "group_by_two_level_threshold_bytes": (None, "see group_by_two_level_threshold"),
    "empty_result_for_aggregation_by_empty_set": (None, "fixed ANSI semantics (global agg on empty = 1 row)"),
    "max_subquery_depth": (None, "no analyzer depth cap"),
    "max_pipeline_depth": (None, "whole-stage codegen collapses pipelines"),
    "max_ast_depth": (None, "no analyzer depth cap"),
    "max_ast_elements": (None, "no analyzer size cap"),
    "max_expanded_ast_elements": (None, "no analyzer size cap"),
    # --- compression (bootstrap.go:156-158; compress_settings.go:13-20) ---
    "network_compression_method": ("spark.io.compression.codec", "lz4 default (static at executor launch; applies to new shuffles)"),
    "network_zstd_compression_level": (None, "spark.io.compression.zstd.level (static conf)"),
    # --- codegen / optimizer passthroughs (query_settings.go:133-141, 181) ---
    "enable_optimize_predicate_expression": (None, "PushDownPredicates always on"),
    "optimize_move_to_prewhere": (None, "parquet row-group stats skipping"),
    "compile": ("spark.sql.codegen.wholeStage", "codegen toggle"),
    "compile_expressions": ("spark.sql.codegen.wholeStage", "codegen toggle"),
    "min_count_to_compile": (None, "codegen has no warm-up count"),
    "min_count_to_compile_expression": (None, "codegen has no warm-up count"),
    "optimize_min_equality_disjunction_chain_length": (None, "OptimizeIn rewrite automatic"),
    "use_index_for_in_with_subqueries": ("spark.sql.optimizer.dynamicPartitionPruning.enabled", "subquery-driven pruning"),
    "allow_experimental_cross_to_join_conversion": ("spark.sql.crossJoin.enabled", "cross-join gate"),
    "use_uncompressed_cache": ("spark.sql.inMemoryColumnarStorage.compressed", "cache codec (INVERTED: uncompressed=1 -> compressed=false)"),
    "decimal_check_overflow": (None, "ANSI mode governs overflow behavior (spark.sql.ansi.enabled)"),
    # --- parallelism ---
    "max_threads": ("spark.sql.shuffle.partitions", "parallelism knob"),
    # --- timeouts (timeQS block, query_settings.go:199-217) ---
    "connect_timeout": (None, "cluster-manager concern"),
    "connect_timeout_with_failover_ms": (None, "cluster-manager concern"),
    "receive_timeout": (None, "spark.network.timeout (static conf)"),
    "send_timeout": (None, "spark.network.timeout (static conf)"),
    "tcp_keep_alive_timeout": (None, "cluster-manager concern"),
    "queue_max_wait_ms": (None, "scheduler queue; fair scheduler config"),
    "stream_flush_interval_ms": (None, "writeStream trigger(processingTime=...)"),
    "stream_poll_timeout_ms": (None, "streaming source poll; trigger interval"),
    # --- exactly-once / dedup ---
    "insert_deduplicate": (None, "exactly-once via streaming checkpoints / idempotent sinks"),
    "replace_running_query": (None, "cancelJobGroup on the old query id (C1)"),
    "extremes": (None, "df.agg(min,max) companion query (SURVEY §2.5)"),
}

# category rules for the remaining reference settings: (predicate
# prefixes, shared note). First match wins; these are all surfaces a
# single-engine Spark deployment genuinely does not have (CH server
# internals, HTTP interface, replication topology, format micro-knobs).
_CATEGORY_RULES: list[tuple[tuple[str, ...], str]] = [
    (
        ("merge_tree_", "mark_cache_", "min_bytes_to_use_direct_io",
         "force_index_by_date", "force_primary_key",
         "allow_experimental_data_skipping_indices"),
        "MergeTree storage internals; parquet vectorized reader + "
        "row-group statistics skipping are the Spark equivalents",
    ),
    (
        ("input_format_", "output_format_", "format_csv_"),
        "per-format reader/writer options on DataFrameReader/Writer",
    ),
    (
        ("http_", "add_http_cors_header", "enable_http_compression",
         "send_progress_in_http_headers",
         "cancel_http_readonly_queries_on_client_close"),
        "ClickHouse HTTP interface — n/a to a Spark session",
    ),
    (
        ("distributed_", "parallel_replica", "max_parallel_replicas",
         "skip_unavailable_shards", "optimize_skip_unused_shards",
         "force_optimize_skip_unused_shards", "prefer_localhost_replica",
         "fallback_to_stale_replicas", "insert_quorum",
         "select_sequential_consistency", "replication_",
         "allow_distributed_ddl", "max_distributed_connections",
         "connections_with_failover_max_tries",
         "max_replica_delay_for_distributed_queries",
         "table_function_remote_max_addresses", "insert_distributed_",
         "max_fetch_partition_retries_count", "background_"),
        "replica/shard topology — the cluster manager's concern in Spark",
    ),
    (
        ("log_", "calculate_text_stack_trace", "enable_debug_queries"),
        "observability; Spark event log + UI (static confs)",
    ),
    (
        ("read_backoff_",),
        "adaptive read throttling; Spark locality wait + speculation",
    ),
    (
        ("low_cardinality_",),
        "LowCardinality codec; parquet dictionary encoding automatic",
    ),
    (
        ("allow_experimental_", "allow_suspicious_", "allow_hyperscan",
         "allow_simdjson", "allow_ddl", "enable_unaligned_array_join",
         "optimize_throw_if_noop", "mysql_", "odbc_",
         "insert_allow_materialized_columns", "fsync_metadata",
         "use_client_time_zone", "external_table_functions_use_nulls",
         "parallel_view_processing", "max_concurrent_queries_for_user",
         "max_partitions_per_insert_block"),
        "ClickHouse server feature gate with no Spark analogue",
    ),
]


def classify_setting(name: str) -> tuple[str | None, str]:
    """(spark conf | None, note) for ANY reference setting name; raises
    KeyError only for names outside the reference's passthrough list's
    shape (callers treat those as forward-unknown, like the driver)."""
    if name in QUERY_SETTINGS_MAP:
        return QUERY_SETTINGS_MAP[name]
    for prefixes, note in _CATEGORY_RULES:
        if any(name.startswith(p) for p in prefixes):
            return (None, note)
    raise KeyError(name)


# Spark confs with boolean types: CH 0/1 values are coerced to
# 'true'/'false' before set (Spark validates these at set time).
_BOOLEAN_CONFS = {
    "spark.sql.codegen.wholeStage",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled",
    "spark.sql.crossJoin.enabled",
    "spark.sql.inMemoryColumnarStorage.compressed",
}
# confs whose CH source setting has the OPPOSITE polarity
_INVERTED_CONFS = {"spark.sql.inMemoryColumnarStorage.compressed"}


def apply_query_settings(
    spark: SparkSession, settings: dict[str, object]
) -> dict[str, object]:
    """Apply the mappable subset to ``spark.conf``; returns the settings
    that have no runtime conf (caller decides whether that's an error —
    the CH driver silently forwards unknown settings too,
    ch/clickhouse_send_query.go)."""
    unmapped: dict[str, object] = {}
    for key, value in settings.items():
        try:
            conf_key, _note = classify_setting(key)
        except KeyError:
            conf_key = None
        if conf_key is None:
            unmapped[key] = value
        else:
            if conf_key in _BOOLEAN_CONFS:
                truthy = str(value).strip().lower() in ("1", "true", "yes")
                if conf_key in _INVERTED_CONFS:
                    truthy = not truthy
                value = "true" if truthy else "false"
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
