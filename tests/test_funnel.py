"""Behavioral-analytics aggregates (functions/funnel.py): default-mode
ClickHouse semantics pinned on hand-built event sequences —
chain-start overwrite, window cutoff, same-event condition cascade,
considered-event adjacency, non-overlapping chain counting."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from baseline_magician_spark.functions import funnel as fu
from baseline_magician_spark.plans.ch_sql import run_ch_query

T0 = datetime.datetime(2024, 1, 1)


def _t(s: float) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: clean 3-step chain inside the window
        (1, _t(0), "view"), (1, _t(10), "click"), (1, _t(20), "purchase"),
        # u2: click outside the 100 s window -> level 1
        (2, _t(0), "view"), (2, _t(200), "click"),
        # u3: a later view re-opens the window; the chain that
        # completes starts at t=50 (0 -> 130 would be outside)
        (3, _t(0), "view"), (3, _t(50), "view"),
        (3, _t(90), "click"), (3, _t(130), "purchase"),
        # u4: purchase precedes everything -> level 0
        (4, _t(0), "purchase"),
        # u5: click->purchase twice, purchase-without-pending between
        (5, _t(0), "click"), (5, _t(1), "click"), (5, _t(2), "purchase"),
        (5, _t(3), "purchase"), (5, _t(4), "click"), (5, _t(5), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def _agg(events, *cols):
    out = events.groupBy("user_id").agg(*cols).orderBy("user_id")
    return {r["user_id"]: r for r in out.collect()}


def _conds(*names):
    return [F.col("event_type") == n for n in names]


def test_window_funnel_levels(events):
    got = _agg(
        events,
        fu.window_funnel(
            100, F.col("ts"), *_conds("view", "click", "purchase")
        ).alias("lvl"),
    )
    assert {u: r["lvl"] for u, r in got.items()} == {
        1: 3,  # full chain
        2: 1,  # click at +200 s misses the 100 s window
        3: 3,  # chain-start overwrite: 50 -> 90 -> 130
        4: 0,  # no view at all
        5: 0,
    }


def test_window_funnel_boundary_is_inclusive(spark):
    # t = start + window is IN (CH compares `ts <= start + window`)
    rows = [(1, _t(0), "a"), (1, _t(100), "b"), (2, _t(0), "a"),
            (2, _t(100.000001), "b")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = _agg(
        df,
        fu.window_funnel(100, F.col("ts"), *_conds("a", "b")).alias("lvl"),
    )
    assert got[1]["lvl"] == 2  # exactly on the boundary
    assert got[2]["lvl"] == 1  # one microsecond past it


def test_window_funnel_same_event_cascades(spark):
    # one event matching cond1 AND cond2 advances both levels (CH
    # inserts one (ts, idx) entry per matched condition)
    rows = [(1, _t(0), 5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, v int")
    got = _agg(
        df,
        fu.window_funnel(
            10, F.col("ts"), F.col("v") > 0, F.col("v") > 1
        ).alias("lvl"),
    )
    assert got[1]["lvl"] == 2


def test_retention(events):
    got = _agg(
        events,
        fu.retention(*_conds("view", "click", "purchase")).alias("r"),
    )
    assert got[1]["r"] == [1, 1, 1]
    assert got[2]["r"] == [1, 1, 0]
    # base condition never met -> all zeros even though others fired
    assert got[5]["r"] == [0, 0, 0]


def test_sequence_match_subsequence_and_adjacency(events):
    got = _agg(
        events,
        fu.sequence_match(
            "(?1).*(?2)", F.col("ts"), *_conds("view", "purchase")
        ).alias("sub"),
        # adjacency over CONSIDERED events: u1's click sits between
        # view and purchase but matches neither condition, so view
        # and purchase ARE adjacent in the condensed sequence
        fu.sequence_match(
            "(?1)(?2)", F.col("ts"), *_conds("view", "purchase")
        ).alias("adj"),
        # with click as a third condition the events stop being
        # adjacent (the click char now sits between them)
        fu.sequence_match(
            "(?1)(?2)", F.col("ts"), *_conds("view", "purchase", "click")
        ).alias("adj3"),
    )
    assert got[1]["sub"] and got[1]["adj"] and not got[1]["adj3"]
    assert not got[2]["sub"]
    assert not got[4]["sub"]  # purchase only: no view before it


def test_sequence_match_dot_counts_considered_events_only(events):
    # u1: view . purchase -> the '.' must match the click event
    got = _agg(
        events,
        fu.sequence_match(
            "(?1).(?2)", F.col("ts"), *_conds("view", "purchase", "click")
        ).alias("m"),
    )
    assert got[1]["m"]


def test_sequence_count_non_overlapping(events):
    # u5 condensed click/purchase sequence: C C P P C P -> chains
    # [c@0..p@2] and [c@4..p@5]; the p@3 has no pending click
    got = _agg(
        events,
        fu.sequence_count(
            "(?1).*(?2)", F.col("ts"), *_conds("click", "purchase")
        ).alias("n"),
    )
    assert got[5]["n"] == 2
    assert got[1]["n"] == 1
    assert got[4]["n"] == 0


def test_pattern_translation_errors():
    with pytest.raises(ValueError, match="time constraints"):
        fu.translate_pattern("(?1)(?t<=100)(?2)", 2)
    with pytest.raises(ValueError, match="references condition 3"):
        fu.translate_pattern("(?1).*(?3)", 2)
    with pytest.raises(ValueError, match="unsupported pattern"):
        fu.translate_pattern("(?1)+", 1)


def test_cond_arity_limits():
    with pytest.raises(ValueError, match="at least one"):
        fu.retention()
    with pytest.raises(ValueError, match="at most"):
        fu.window_funnel(10, F.col("ts"), *[F.lit(True)] * 6)


def test_ch_sql_spelling(events):
    out = run_ch_query(
        """
        SELECT user_id,
               windowFunnel(100)(ts, event_type = 'view',
                       event_type = 'click',
                       event_type = 'purchase') AS lvl,
               retention(event_type = 'view', event_type = 'click') AS r,
               toUInt8(sequenceMatch('(?1).*(?2)')(ts,
                       event_type = 'view', event_type = 'click')) AS sm,
               sequenceCount('(?1).*(?2)')(ts, event_type = 'click',
                       event_type = 'purchase') AS sc
        FROM t GROUP BY user_id ORDER BY user_id
        """,
        {"t": events},
    ).collect()
    by_user = {r["user_id"]: r for r in out}
    assert by_user[1]["lvl"] == 3 and by_user[1]["sm"] == 1
    assert by_user[2]["lvl"] == 1
    assert by_user[5]["r"] == [0, 0] and by_user[5]["sc"] == 2


def test_ch_sql_param_errors(events):
    with pytest.raises(ValueError, match=r"takes \(param\)"):
        run_ch_query("SELECT windowFunnel(10) FROM t", {"t": events})
    with pytest.raises(ValueError, match="string literal"):
        run_ch_query(
            "SELECT sequenceMatch(1)(ts, event_type = 'view') FROM t",
            {"t": events},
        )


# --- sequenceNextNode ------------------------------------------------------


@pytest.fixture()
def pages(spark):
    rows = [
        (1, "2024-01-01 00:00:01", "Home"),
        (1, "2024-01-01 00:00:02", "Gift"),
        (1, "2024-01-01 00:00:03", "Exit"),
        (2, "2024-01-01 00:00:01", "Home"),
        (2, "2024-01-01 00:00:02", "Home"),
        (2, "2024-01-01 00:00:03", "Gift"),
        (2, "2024-01-01 00:00:04", "Basket"),
        (3, "2024-01-01 00:00:01", "Gift"),
        (3, "2024-01-01 00:00:02", "Home"),
    ]
    return spark.createDataFrame(rows, "id int, dts string, page string")


def _next_nodes(pages, direction, base, *chain):
    conds = ", ".join(f"page = '{c}'" for c in chain)
    out = run_ch_query(
        f"SELECT id, sequenceNextNode('{direction}', '{base}')("
        f"toDateTime(dts), page, page = '{chain[0]}', {conds}) AS nxt"
        " FROM t GROUP BY id ORDER BY id",
        {"t": pages},
    ).collect()
    return {r.id: r.nxt for r in out}


def test_sequence_next_node_forward_head(pages):
    # the CH documentation's own Home -> Gift example
    assert _next_nodes(pages, "forward", "head", "Home", "Gift") == {
        1: "Exit",   # Home, Gift, then Exit
        2: None,     # second event is Home, not Gift
        3: None,     # head is Gift, base condition fails
    }


def test_sequence_next_node_first_match(pages):
    assert _next_nodes(pages, "forward", "first_match", "Gift") == {
        1: "Exit", 2: "Basket", 3: "Home",
    }


def test_sequence_next_node_backward_tail(pages):
    assert _next_nodes(pages, "backward", "tail", "Basket") == {
        1: None, 2: "Gift", 3: None,
    }


def test_sequence_next_node_backward_last_match(pages):
    assert _next_nodes(pages, "backward", "last_match", "Gift") == {
        1: "Home", 2: "Home", 3: None,
    }


def test_sequence_next_node_chain_past_end(pages):
    # chain matches but there is no following event -> NULL
    assert _next_nodes(
        pages, "forward", "head", "Home", "Gift", "Exit"
    ) == {1: None, 2: None, 3: None}


def test_sequence_next_node_errors(pages):
    with pytest.raises(ValueError, match="direction"):
        run_ch_query(
            "SELECT sequenceNextNode('sideways', 'head')("
            "toDateTime(dts), page, page = 'x', page = 'x') FROM t",
            {"t": pages},
        )


def test_sequence_next_node_no_reanchoring(spark):
    # CH anchors ONCE at the first event1 match; a failed chain there
    # must NOT re-anchor at a later matching window
    rows = [
        (1, "2024-01-01 00:00:01", "A"),
        (1, "2024-01-01 00:00:02", "X"),
        (1, "2024-01-01 00:00:03", "A"),
        (1, "2024-01-01 00:00:04", "B"),
        (1, "2024-01-01 00:00:05", "C"),
    ]
    df = spark.createDataFrame(rows, "id int, dts string, page string")
    got = run_ch_query(
        "SELECT sequenceNextNode('forward', 'first_match')("
        "toDateTime(dts), page, page = 'A', page = 'A', page = 'B')"
        " AS nxt FROM t GROUP BY id",
        {"t": df},
    ).collect()[0].nxt
    assert got is None  # first A is followed by X, chain fails there
