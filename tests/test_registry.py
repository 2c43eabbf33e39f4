"""Registry invariants: the priority window resolves and every query
has matching oracle column expectations handled by the parity suite."""

from __future__ import annotations


def test_priority_names_all_registered():
    from baseline_magician_spark.registry import _PRIORITY, get_queries

    names = set(get_queries())
    missing = [n for n in _PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_priority_fits_checked_window():
    """The external harness checks only the first 50 registered names;
    every _PRIORITY entry must land inside that window or it is a
    regression guard that never actually runs (round-2 advice)."""
    from baseline_magician_spark.registry import _PRIORITY

    assert len(_PRIORITY) <= 50, (
        f"_PRIORITY has {len(_PRIORITY)} names; the harness checks 50"
    )
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate names"


def test_priority_orders_prefix():
    from baseline_magician_spark.registry import (
        _PRIORITY,
        get_oracles,
        get_queries,
    )

    q = list(get_queries())
    assert q[: len(_PRIORITY)] == list(_PRIORITY)
    # queries and oracles must present the SAME order to the driver
    o = list(get_oracles())
    assert [n for n in q if n in set(o)] == o


def test_every_query_has_oracle_or_documented_exemption():
    from baseline_magician_spark.registry import get_oracles, get_queries

    no_oracle = set(get_queries()) - set(get_oracles())
    # rows-only checks are reserved for genuinely non-SQL-expressible
    # ops — and as of round 7 there are NONE: even LTTB's greedy
    # bucket walk has a full oracle (its k-2 sequential choices
    # unroll into chained argmax CTEs; queries/ch_sql_q._lttb_oracle).
    assert no_oracle == set(), no_oracle
