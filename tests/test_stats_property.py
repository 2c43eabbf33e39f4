"""Property tests for the stats/interval aggregates: random inputs
against independent Python/numpy references — ranks with average
ties, ECDF gaps, interval sweeps. Few examples (each builds a tiny
DataFrame and runs a job) but unconstrained shapes: duplicates,
negatives, single-element runs, fully-tied samples.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from baseline_magician_spark.plans.ch_sql import run_ch_query

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=4, max_size=24
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _mwu_ref(v, idx):
    v = np.asarray(v, dtype=float)
    idx = np.asarray(idx)
    order = np.argsort(v, kind="stable")
    sv, sl = v[order], idx[order]
    ranks = np.empty(len(sv))
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[i : j + 1] = (i + 1 + j + 1) / 2
        i = j + 1
    n0 = int((idx == 0).sum())
    return ranks[sl == 0].sum() - n0 * (n0 + 1) / 2


@_slow
@given(vals=_vals)
def test_mann_whitney_matches_reference(spark, vals):
    idx = [i % 2 for i in range(len(vals))]
    if sum(idx) == 0 or sum(idx) == len(idx):
        return
    df = _df(
        spark,
        [(float(v), i) for v, i in zip(vals, idx)],
        "v double, idx int",
    )
    got = run_ch_query(
        "SELECT tupleElement(mannWhitneyUTest(v, idx), 'u_statistic') "
        "AS u FROM t",
        {"t": df},
    ).collect()[0].u
    assert math.isclose(got, _mwu_ref(vals, idx), abs_tol=1e-9)


@_slow
@given(vals=_vals)
def test_ks_matches_reference(spark, vals):
    idx = [i % 2 for i in range(len(vals))]
    a = np.array([v for v, i in zip(vals, idx) if i == 0], dtype=float)
    b = np.array([v for v, i in zip(vals, idx) if i == 1], dtype=float)
    if len(a) == 0 or len(b) == 0:
        return
    want = max(
        abs((a <= x).mean() - (b <= x).mean())
        for x in np.unique(np.asarray(vals, dtype=float))
    )
    df = _df(
        spark,
        [(float(v), i) for v, i in zip(vals, idx)],
        "v double, idx int",
    )
    got = run_ch_query(
        "SELECT tupleElement(kolmogorovSmirnovTest(v, idx), "
        "'d_statistic') AS d FROM t",
        {"t": df},
    ).collect()[0].d
    assert math.isclose(got, want, abs_tol=1e-9)


@_slow
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=1, max_value=15),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_interval_sweeps_match_reference(spark, ivs):
    intervals = [(float(s), float(s + d)) for s, d in ivs]
    # union length by brute force on the integer-ish grid
    covered = set()
    for s, e in intervals:
        x = s
        while x < e:
            covered.add(x)
            x += 1.0
    want_len = float(len(covered))
    # max concurrency over half-open intervals: sweep events
    events = sorted(
        [(s, 1) for s, _ in intervals] + [(e, -1) for _, e in intervals]
    )
    cur = best = 0
    for _, d in events:
        cur += d
        best = max(best, cur)
    df = _df(spark, intervals, "s double, e double")
    row = run_ch_query(
        "SELECT intervalLengthSum(s, e) AS l, "
        "maxIntersections(s, e) AS m FROM t",
        {"t": df},
    ).collect()[0]
    assert row.l == want_len
    assert row.m == best


@_slow
@given(vals=_vals)
def test_delta_sum_timestamp_matches_reference(spark, vals):
    # strictly increasing unique timestamps -> deterministic walk
    rows = [(float(t), float(v)) for t, v in enumerate(vals)]
    want = sum(
        max(0.0, b - a) for a, b in zip(vals, vals[1:])
    )
    df = _df(spark, rows, "t double, v double")
    got = run_ch_query(
        "SELECT deltaSumTimestamp(v, t) AS d FROM t", {"t": df}
    ).collect()[0].d
    assert got == want


@_slow
@given(vals=_vals)
def test_entropy_matches_reference(spark, vals):
    v = [x % 5 for x in vals]
    n = len(v)
    want = -sum(
        (v.count(u) / n) * math.log2(v.count(u) / n) for u in set(v)
    )
    df = _df(spark, [(x,) for x in v], "x int")
    got = run_ch_query(
        "SELECT entropy(x) AS e FROM t", {"t": df}
    ).collect()[0].e
    assert math.isclose(got, want, abs_tol=1e-9)
