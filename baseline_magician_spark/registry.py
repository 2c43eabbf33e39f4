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
# Round-4 window (the harness checks the first 50 names; a test pins
# len <= 50 so nothing silently falls outside it). This window closes
# the driver-coverage ledger: union of rounds 1–4 = every registered
# query driver-checked at least once.
# - head: the 8 round-3 late additions that landed after the r3 window
#   froze and have never had a driver row (all hash-green in the local
#   oracle run recorded in VERDICT.md — bookkeeping, not debugging);
# - new round-4 queries as they land (correlated EXISTS/IN in the CH
#   front end, CH-dialect INSERT, the real WAV decode path);
# - the rotating tail: all 34 queries whose only driver check was
#   round 1, re-covering every deferral the round-3 comment listed.
_PRIORITY: tuple[str, ...] = (
    # never driver-checked (round-3 late additions)
    "ch_sql_any_join",
    "ch_sql_intersect_users",
    "ch_sql_json_extract",
    "ch_sql_scalar_with",
    "ch_sql_star_modifiers",
    "ch_sql_tpch_q6",
    "dedup_simhash_clusters",
    "similarity_pq_recon_error",
    # new round-4 queries are appended to this block in the same
    # commit that registers them (a test pins every name here to an
    # actual registration)
    "ch_sql_exists_correlated",
    "ch_sql_in_correlated",
    "ch_sql_not_in_correlated",
    "multimodal_wav_decode",
    "ch_sql_insert_select",
    "ch_sql_tpch_q17",
    "text_dsir_importance",
    # regression guard: connected-components convergence changed this
    # round; the capstone composition rides that code path (its dedup
    # siblings are already in the r1-only rotation below)
    "pipeline_training_export",
    # r1-only rotation: everything whose last driver row is round 1
    "asof_join_latest_order",
    "dedup_exact_groups",
    "dedup_simhash_fingerprints",
    "pipeline_corpus_cleanup",
    "dedup_keep_best_per_cluster",
    "dedup_incremental_ingest",
    "similarity_lsh_bucket_histogram",
    "multimodal_frame_sample",
    "profile_orders_table",
    "window_topn_orders_per_segment",
    "window_running_revenue",
    "rollup_totals_by_region_nation",
    "extremes_value_by_type",
    "set_ops_customer_tiers",
    "semi_anti_join_customers",
    "distinct_users_by_type",
    "pivot_quantity_by_status",
    "time_window_recent_events",
    "skew_salted_distinct_users",
    "cube_revenue_by_flag_status",
    "grouping_sets_quantity",
    "exact_percentiles_by_type",
    "histogram_event_values",
    "window_range_frame_sliding_sum",
    "json_props_stats",
    "unpivot_lineitem_measures",
    "window_lag_lead_user_deltas",
    "sample_split_train_valid_test",
    "sample_stratified_by_lang",
    "sample_quota_per_source",
    "sample_mixture_plan",
    "streaming_windowed_counts",
    "streaming_sessionize_gap",
    "streaming_baseline_windows",
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
