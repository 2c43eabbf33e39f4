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
# Round-8 window (the harness checks the first 50 names; a test pins
# len <= 50 so nothing silently falls outside it). Union of rounds
# 1-7: 209/210 checked. This window:
# - leads with profile_documents_table, the only never-checked name
#   (registered after the r7 window froze);
# - then ALL 22 r3-stale names (oldest remaining driver rows — after
#   this round nothing older than r4 remains);
# - new round-8 registrations as they land (appended to their block
#   in the SAME commit that registers them; each costs an r4-stale
#   trade to stay under the 50 pin);
# - the rest: r4-stale names picked for operator diversity (50
#   remain; the leftovers rotate in r9). The full local sweep — the
#   driver's OWN canonicalization (tests/test_oracle_parity.py) —
#   remains the compensating control for everything outside the
#   window, and tests/test_rotation_staleness.py now FAILS if any
#   name's latest driver row falls >4 rounds behind while absent
#   from this window.
_PRIORITY: tuple[str, ...] = (
    # never driver-checked
    "profile_documents_table",
    # all 22 r3-stale rows (complete — nothing r3 remains after r8)
    "ch_sql_with_totals",
    "dedup_semantic_keep_best",
    "dedup_simhash_band_pairs",
    "events_hourly_rollup_incremental",
    "multimodal_audio_window_rms",
    "multimodal_frame_deltas",
    "pipeline_bucketed_batches",
    "pipeline_curriculum_phases",
    "rag_chunk_overlap_manifest",
    "sample_temperature_weights",
    "similarity_ivfpq_topk",
    "similarity_lsh_neardup_pairs",
    "similarity_pq_adc_topk",
    "similarity_pq_codes",
    "skew_salted_join_event_types",
    "streaming_hourly_rollup_merge",
    "text_bloom_vocab_screen",
    "text_bpe_merge_step",
    "text_cms_heavy_hitters",
    "text_pii_redaction",
    "text_tfidf_top_terms",
    "text_unigram_lm_scores",
    # new round-8 queries land here as they register (slots held —
    # the len <= 50 pin forces an r4-stale trade for each extra one)
    "ch_sql_cityhash64",
    "similarity_recall_at_k",
    "dedup_duplicated_spans_pairwise",
    "ch_sql_siphash64",
    "ch_sql_murmur_hashes",
    "pipeline_contamination_spans",
    "ch_sql_xxhash",
    "pipeline_span_excision",
    # re-check: sampling_hashes changed this round (URLHash moved out
    # when it went byte-exact; intHash chains re-spelled wrap-mode)
    "ch_sql_sampling_hashes",
    # r4-stale rotation (oldest remaining driver rows, diverse ops;
    # one traded out per new registration above; traded so far:
    # semi_anti_join_customers, json_props_stats,
    # grouping_sets_quantity, exact_percentiles_by_type,
    # dedup_incremental_ingest, cube_revenue_by_flag_status,
    # ch_sql_json_extract, ch_sql_scalar_with, histogram_event_values)
    "asof_join_latest_order",
    "ch_sql_any_join",
    "ch_sql_exists_correlated",
    "ch_sql_insert_select",
    "ch_sql_tpch_q6",
    "ch_sql_tpch_q17",
    "dedup_exact_groups",
    "dedup_simhash_clusters",
    "multimodal_wav_decode",
    "pipeline_corpus_cleanup",
    "profile_orders_table",
    "sample_stratified_by_lang",
    "similarity_lsh_bucket_histogram",
    "streaming_windowed_counts",
    "streaming_sessionize_gap",
    "text_dsir_importance",
    "window_running_revenue",
    "unpivot_lineitem_measures",
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
