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
# Round-10 window. Union of rounds 1-9: all 224 registered names
# checked at least once, latest check green. EDF order:
# - ALL 37 r5-era rows first — they reach the MAX_LAG bound when
#   CORRECTNESS_r10 lands, so every one must be in this window
#   (tests/test_rotation_staleness.py enforces this);
# - the 4 rows whose VALUES changed this round: the two hash probes
#   (cityHash64 numeric -> IntHash64Impl, xxHash64 combine ->
#   Hash128to64, computed-expression layouts) and the two corpus
#   compositions (span excision + clean-text digests) — their last
#   green rows replay the superseded models and MUST re-check;
# - new round-10 registrations land here as they register (each
#   trades out an r6-stale name below to stay under the 50 pin);
# - the rest: r6-stale names picked for operator diversity
#   (streaming_funnel_levels leads — its 2.0 s budget floor is under
#   validation this round); the ~29 r6 leftovers lead the r11 window.
# CAPACITY POLICY (round 10): the staleness bound is ceil(N/50),
# DERIVED from the live registry — growing it accepts a slower
# re-check cadence automatically, with a deliberate hard ceiling of
# 8 windows (400 queries) gated in tests/test_rotation_staleness.py
# (full policy rationale lives there, next to the arithmetic).
_PRIORITY: tuple[str, ...] = (
    # all 37 r5-stale rows (complete — nothing r5 remains after r10)
    "approx_distinct_and_quantiles",
    "baseline_thresholds_bucketed_join",
    "ch_sql_ddl_roundtrip",
    "ch_sql_limit_with_ties",
    "ch_sql_qualify_topn",
    "ch_sql_rowvalue_in",
    "ch_sql_select_correlated",
    "ch_sql_tpch_q12",
    "multimodal_stripe_features",
    "pipeline_chunk_manifest",
    "pipeline_sequence_packing",
    "pipeline_shuffle_order",
    "q11_important_part_values",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q20_promo_heavy_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "similarity_ivf_train_step",
    "streaming_click_purchase_join",
    "streaming_dedup_keys",
    "text_eval_decontamination",
    "text_fingerprints",
    "text_frequent_ngrams_topk",
    "text_quality_scores",
    "text_repetition_stats",
    "text_token_counts",
    "text_vocab_coverage",
    "udaf_weighted_mean",
    "udaf_weighted_mean_df",
    # rows whose values changed in round 10 (must re-check)
    "ch_sql_numeric_hashes",
    "ch_sql_hash_combine_chains",
    "pipeline_corpus_cleanup",
    "pipeline_training_export",
    # new round-10 registrations (CDC doc-level gating signal +
    # binary-quantization ANN serving pattern) — each traded out an
    # r6-stale name to stay under the 50 pin
    "dedup_cdc_duplication_ratio",
    "similarity_binary_hamming_topk",
    "similarity_binary_rerank_topk",
    "profile_constraint_checks",
    "profile_key_skew",
    "pipeline_snapshot_diff",
    "text_self_repetition_excision",
    "similarity_matryoshka_recall",
    "similarity_ivf_cell_report",
    # no r6-stale slots left: this round's nine new + four
    # value-changed rows filled the window after the mandatory 37
    # lag-5 names; the r6 cohort (incl. streaming_funnel_levels,
    # whose 2.0 s floor was validated in isolation — BASELINE.md)
    # is at lag 4 after the r10 record and leads r11's window.
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
