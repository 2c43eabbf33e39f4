"""Query registry: the driver-facing (name -> callable) + oracle-SQL maps.

Every operator claimed in SURVEY.md §2 registers a query here via the
``@query`` decorator, together with the ANSI-SQL oracle DuckDB runs on
the same parquet tables. Queries without an oracle (genuinely
non-SQL-expressible ops) register with ``oracle=None`` and get the
driver's weaker rows-only check.

Contract reminders (driver compare):
- column names must match between Spark result and oracle SQL;
- compare is order-insensitive but value-exact -> every fractional
  output is rounded to a fixed scale in BOTH engines;
- timestamps only to second precision in outputs (ns-vs-µs safety).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
_V = TypeVar("_V")

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


_loaded = False

# The external correctness harness checks a bounded prefix of the
# registration order (50 names per round). Names listed here surface
# first so queries that still need a hard signal — never-checked
# families, freshly-fixed rows, and operators added this round — land
# inside the checked window; everything else follows in registration
# order. Rotate per round.
# Round-9 window (the harness checks the first 50 names; a test pins
# len <= 50 so nothing silently falls outside it). Union of rounds
# 1-8: all 218 registered names checked at least once, latest check
# green. This window runs EDF (earliest-deadline-first) over driver
# rows:
# - ALL 32 r4-era rows first — the oldest remaining; once the r9
#   record lands they are 5 rounds behind, exactly the gate's
#   MAX_LAG_ROUNDS, so every one of them must be in this window
#   (tests/test_rotation_staleness.py enforces this);
# - new round-9 registrations as they land (appended to their block
#   in the SAME commit that registers them; each costs an r5-stale
#   trade to stay under the 50 pin);
# - the rest: r5-stale names picked for operator diversity (the
#   leftover r5 rows reach lag 5 at r10 and lead the r10 window).
# The full local sweep — the driver's OWN canonicalization
# (tests/test_oracle_parity.py) — remains the compensating control
# for everything outside the window.
_PRIORITY: tuple[str, ...] = (
    # all 32 r4-stale rows (complete — nothing r4 remains after r9)
    "ch_sql_in_correlated",
    "ch_sql_intersect_users",
    "ch_sql_json_extract",
    "ch_sql_not_in_correlated",
    "ch_sql_scalar_with",
    "ch_sql_star_modifiers",
    "cube_revenue_by_flag_status",
    "dedup_incremental_ingest",
    "dedup_keep_best_per_cluster",
    "dedup_simhash_fingerprints",
    "distinct_users_by_type",
    "exact_percentiles_by_type",
    "extremes_value_by_type",
    "grouping_sets_quantity",
    "histogram_event_values",
    "json_props_stats",
    "multimodal_frame_sample",
    "pipeline_training_export",
    "pivot_quantity_by_status",
    "rollup_totals_by_region_nation",
    "sample_mixture_plan",
    "sample_quota_per_source",
    "sample_split_train_valid_test",
    "semi_anti_join_customers",
    "set_ops_customer_tiers",
    "similarity_pq_recon_error",
    "skew_salted_distinct_users",
    "streaming_baseline_windows",
    "time_window_recent_events",
    "window_lag_lead_user_deltas",
    "window_range_frame_sliding_sum",
    "window_topn_orders_per_segment",
    # new round-9 queries land here as they register (slots held —
    # the len <= 50 pin forces an r5-stale trade for each extra one)
    "ch_sql_numeric_hashes",
    "ch_sql_murmur3_hashes",
    "ch_sql_kafka_hashes",
    "ch_sql_hash_combine_chains",
    "dedup_cdc_chunk_spans",
    "dedup_cdc_shared_chunks",
    # r5-stale rotation (oldest rows after the r4 block, diverse
    # ops; one traded out per new registration above; the ~31 r5
    # leftovers lead the r10 window at lag 5)
    "baseline_thresholds",
    "q1_pricing_summary",
    "ch_sql_tpch_q3",
    "ch_sql_param_binding",
    "ch_sql_recursive_cte",
    "ch_sql_in_external_table",
    "dedup_edit_distance_pairs",
    "multimodal_bmp_decode",
    "similarity_ivf_topk",
    "similarity_kmeans_three_steps",
    "streaming_stateful_anomalies",
    "text_language_id",
)


def _load() -> None:
    global _loaded
    if _loaded:
        return
    # Import for registration side effects.
    from .queries import (  # noqa: F401
        asof_q,
        baseline_q,
        ch_sql_q,
        dedup_q,
        multimodal_q,
        packing_q,
        profiling_q,
        relational,
        sampling_q,
        similarity_q,
        streaming_q,
        text_q,
        tpch,
        tpch_ext,
        udaf_q,
    )

    _loaded = True


def _ordered(mapping: dict[str, _V]) -> dict[str, _V]:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    head.update((n, v) for n, v in mapping.items() if n not in head)
    return head


def get_queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(_QUERIES)


def get_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)
