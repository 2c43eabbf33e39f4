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
# Round-5 window (the harness checks the first 50 names; a test pins
# len <= 50 so nothing silently falls outside it). Union of rounds
# 1–4 covered 146/152 registered queries; this window re-closes the
# ledger and starts the staleness rotation:
# - head: the 6 round-4 tail registrations that landed after the r4
#   window froze and have never had a driver row (all verified green
#   with the driver's exact recipe in VERDICT.md — bookkeeping);
# - new round-5 queries as they land (recursive CTEs, BMP decode,
#   CH DDL, row-value IN) — appended to their block in the SAME commit
#   that registers them;
# - the rotating tail: names whose last driver row is round 2,
#   ever-red rows first (all re-checked green since), then operator
#   diversity; the 7 r2-stale TPC-H names that don't fit (q7 q8 q9
#   q10 q15 q16 q19) lead the round-6 rotation, together with the
#   round-5 registrations past slot 50 (ch_sql_url_time_functions,
#   ch_sql_uniq_state_merge, ch_sql_mutations, ch_sql_topk,
#   ch_sql_state_merge_rollup, ch_sql_arrayjoin_expression,
#   ch_sql_ansi_spellings, ch_sql_comma_join_analytic,
#   ch_sql_stats_aggregates, ch_sql_dictget_lookup,
#   ch_sql_window_funnel, ch_sql_retention_sequence,
#   dedup_duplicated_spans, multimodal_y4m_decode,
#   ch_sql_summap_by_group — each
#   verified locally with the driver's exact recipe when registered).
_PRIORITY: tuple[str, ...] = (
    # never driver-checked (round-4 tail registrations)
    "ch_sql_tpch_q3",
    "ch_sql_tpch_q12",
    "ch_sql_numbers_rollup",
    "ch_sql_select_correlated",
    "ch_sql_qualify_topn",
    "ch_sql_limit_with_ties",
    # new round-5 queries land here as they register
    "ch_sql_recursive_cte",
    "ch_sql_rowvalue_in",
    "multimodal_bmp_decode",
    "ch_sql_ddl_roundtrip",
    # ever-red in some past round (every one re-checked green later;
    # keep their signal fresh)
    "approx_distinct_and_quantiles",
    "similarity_ivf_train_step",
    "multimodal_stripe_features",
    # r2-stale rotation: last driver row is round 2
    "baseline_thresholds",
    "baseline_thresholds_bucketed_join",
    "ch_sql_param_binding",
    "ch_sql_in_external_table",
    "dedup_edit_distance_pairs",
    "similarity_ivf_topk",
    "similarity_kmeans_three_steps",
    "pipeline_sequence_packing",
    "pipeline_chunk_manifest",
    "pipeline_shuffle_order",
    "streaming_stateful_anomalies",
    "streaming_dedup_keys",
    "streaming_click_purchase_join",
    "text_quality_scores",
    "text_language_id",
    "text_token_counts",
    "text_fingerprints",
    "text_frequent_ngrams_topk",
    "text_eval_decontamination",
    "text_vocab_coverage",
    "text_repetition_stats",
    "udaf_weighted_mean",
    "udaf_weighted_mean_df",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q11_important_part_values",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q20_promo_heavy_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
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
