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

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

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


def _load() -> None:
    global _loaded
    if _loaded:
        return
    # Import for registration side effects.
    from .queries import (  # noqa: F401
        asof_q,
        baseline_q,
        dedup_q,
        multimodal_q,
        profiling_q,
        relational,
        sampling_q,
        similarity_q,
        streaming_q,
        text_q,
        tpch,
        tpch_ext,
    )

    _loaded = True


def get_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def get_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
