"""Statistical-test / interval aggregate family
(functions/stats_tests.py): values pinned against independent numpy
computations (regression, t-tests, Mann-Whitney ranks, KS distance)
and hand-checked interval sweeps.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (
            i,
            float(i),
            float(2 * i + 1 + (i % 3)),
            i % 2,
            float(i % 5),
            float(i % 5) + 2.0,
        )
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "id int, x double, y double, grp int, s double, e double"
    )


def _one(tdf, expr_sql):
    return run_ch_query(
        f"SELECT {expr_sql} AS r FROM t", {"t": tdf}
    ).collect()[0].r


@pytest.fixture(scope="module")
def ref():
    i = np.arange(20)
    x = i.astype(float)
    y = (2 * i + 1 + (i % 3)).astype(float)
    grp = i % 2
    return x, y, grp


def test_simple_linear_regression(tdf, ref):
    x, y, _ = ref
    k, b = np.polyfit(x, y, 1)
    got = _one(tdf, "simpleLinearRegression(x, y)")
    assert math.isclose(got.k, k, rel_tol=1e-9)
    assert math.isclose(got.b, b, rel_tol=1e-9, abs_tol=1e-9)


def test_bounding_ratio(tdf, ref):
    x, y, _ = ref
    want = (y.max() - y.min()) / (x.max() - x.min())
    assert math.isclose(_one(tdf, "boundingRatio(x, y)"), want)


def test_entropy(tdf):
    # two equally likely groups -> exactly 1 bit
    assert math.isclose(_one(tdf, "entropy(grp)"), 1.0)
    # four equally likely values -> 2 bits
    assert math.isclose(_one(tdf, "entropy(id % 4)"), 2.0)


def test_group_bitmap(tdf):
    assert _one(tdf, "groupBitmap(grp)") == 2
    assert _one(tdf, "groupBitmap(id % 7)") == 7


def test_delta_sums(tdf, ref):
    _, y, _ = ref
    # y is non-decreasing in x order -> positive deltas = y[-1]-y[0]
    assert _one(tdf, "deltaSumTimestamp(y, x)") == y[-1] - y[0]
    # x itself increasing 0..19
    assert _one(tdf, "deltaSum(x)") == 19.0


def test_delta_sum_timestamp_with_dips(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 2.0), (3.0, 7.0), (4.0, 6.0), (5.0, 8.0)],
        "t double, v double",
    )
    # rises: 2->7 (+5), 6->8 (+2)  => 7
    got = run_ch_query(
        "SELECT deltaSumTimestamp(v, t) AS r FROM t", {"t": df}
    ).collect()[0].r
    assert got == 7.0


def test_exponential_moving_average(spark):
    df = spark.createDataFrame(
        [(0.0, 10.0), (1.0, 20.0)], "t double, v double"
    )
    # halflife 1: weights 2^-1 and 1 -> (10*0.5 + 20) / 1.5
    got = run_ch_query(
        "SELECT exponentialMovingAverage(1)(v, t) AS r FROM t",
        {"t": df},
    ).collect()[0].r
    assert math.isclose(got, (10 * 0.5 + 20) / 1.5)


def test_interval_length_sum(tdf, spark):
    # [0,2] [1,3] [2,4] [3,5] [4,6] union = [0,6]
    assert _one(tdf, "intervalLengthSum(s, e)") == 6.0
    df = spark.createDataFrame(
        [(0.0, 1.0), (5.0, 7.0), (6.0, 6.5)], "s double, e double"
    )
    got = run_ch_query(
        "SELECT intervalLengthSum(s, e) AS r FROM t", {"t": df}
    ).collect()[0].r
    assert got == 3.0  # 1 + 2, the nested [6,6.5] absorbed


def test_max_intersections(tdf, spark):
    # each of the 5 staggered intervals repeats 4x; at t=2.5 two
    # distinct intervals are open -> 8
    assert _one(tdf, "maxIntersections(s, e)") == 8
    df = spark.createDataFrame(
        [(0.0, 2.0), (2.0, 4.0)], "s double, e double"
    )
    # half-open: [0,2) and [2,4) never overlap
    got = run_ch_query(
        "SELECT maxIntersections(s, e) AS r FROM t", {"t": df}
    ).collect()[0].r
    assert got == 1


def _numpy_two_sample(ref):
    x, y, grp = ref
    a, c = y[grp == 0], y[grp == 1]
    n0, n1 = len(a), len(c)
    m0, m1 = a.mean(), c.mean()
    v0, v1 = a.var(ddof=1), c.var(ddof=1)
    return a, c, n0, n1, m0, m1, v0, v1


def test_student_t(tdf, ref):
    a, c, n0, n1, m0, m1, v0, v1 = _numpy_two_sample(ref)
    sp2 = ((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)
    t = (m0 - m1) / math.sqrt(sp2 * (1 / n0 + 1 / n1))
    got = _one(tdf, "studentTTest(y, grp)")
    assert math.isclose(got.t_statistic, t, rel_tol=1e-9)
    assert 0.0 <= got.p_value <= 1.0


def test_welch_t(tdf, ref):
    a, c, n0, n1, m0, m1, v0, v1 = _numpy_two_sample(ref)
    t = (m0 - m1) / math.sqrt(v0 / n0 + v1 / n1)
    got = _one(tdf, "welchTTest(y, grp)")
    assert math.isclose(got.t_statistic, t, rel_tol=1e-9)


def test_mann_whitney(tdf, ref):
    x, y, grp = ref
    order = np.argsort(y, kind="stable")
    sv, sl = y[order], grp[order]
    ranks = np.empty(len(sv))
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[i : j + 1] = (i + 1 + j + 1) / 2
        i = j + 1
    n0 = int((grp == 0).sum())
    u0 = ranks[sl == 0].sum() - n0 * (n0 + 1) / 2
    got = _one(tdf, "mannWhitneyUTest(y, grp)")
    assert got.u_statistic == u0
    assert 0.0 <= got.p_value <= 1.0
    g = _one(tdf, "mannWhitneyUTest('greater')(y, grp)")
    l = _one(tdf, "mannWhitneyUTest('less')(y, grp)")
    assert math.isclose(g.p_value + l.p_value, 1.0)


def test_ks(tdf, ref):
    x, y, grp = ref
    a, c = y[grp == 0], y[grp == 1]
    d = max(
        abs((a <= v).mean() - (c <= v).mean()) for v in np.unique(y)
    )
    got = _one(tdf, "kolmogorovSmirnovTest(y, grp)")
    assert math.isclose(got.d_statistic, d, rel_tol=1e-9)
    assert 0.0 <= got.p_value <= 1.0


def test_histogram(tdf, ref):
    x, y, grp = ref
    got = _one(tdf, "histogram(4)(y)")
    assert len(got) == 4
    assert sum(b.cnt for b in got) == 20
    assert math.isclose(got[0].lo, y.min())
    assert math.isclose(got[-1].hi, y.max())
    # equal-width bins, contiguous edges
    for b1, b2 in zip(got, got[1:]):
        assert math.isclose(b1.hi, b2.lo)


def test_sparkbar(tdf):
    bar = _one(tdf, "sparkbar(8)(x, y)")
    assert len(bar) == 8
    assert bar[-1] == "█"  # the largest bucket renders full
    assert all(ch in " ▁▂▃▄▅▆▇█" for ch in bar)
    bar1 = _one(tdf, "sparkbar(8)(x)")
    assert len(bar1) == 8


def test_grouped_stats(tdf):
    # the whole family runs inside GROUP BY like any aggregate
    out = run_ch_query(
        """
        SELECT grp,
               round(boundingRatio(x, y), 6) AS br,
               maxIntersections(s, e) AS mi
        FROM t GROUP BY grp ORDER BY grp
        """,
        {"t": tdf},
    ).collect()
    assert len(out) == 2
    assert all(r.mi >= 1 for r in out)


# ------------------------------------- categorical association family


@pytest.fixture(scope="module")
def adf(spark):
    # a 3x2 contingency table with a known chi-squared:
    # cells (a,p)=4 (a,q)=1 (b,p)=1 (b,q)=4 (c,p)=2 (c,q)=3
    cells = [
        ("a", "p", 4), ("a", "q", 1),
        ("b", "p", 1), ("b", "q", 4),
        ("c", "p", 2), ("c", "q", 3),
    ]
    rows = [(x, y) for x, y, n in cells for _ in range(n)]
    return spark.createDataFrame(rows, "x string, y string")


def _assoc_ref():
    obs = np.array([[4, 1], [1, 4], [2, 3]], dtype=float)
    n = obs.sum()
    rs = obs.sum(axis=1, keepdims=True)
    cs = obs.sum(axis=0, keepdims=True)
    exp = rs @ cs / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    return obs, n, rs.ravel(), cs.ravel(), chi2


def test_cramers_v(adf):
    _, n, rs, cs, chi2 = _assoc_ref()
    want = math.sqrt(chi2 / n / min(len(rs) - 1, len(cs) - 1))
    assert math.isclose(_one(adf, "cramersV(x, y)"), want, rel_tol=1e-9)


def test_cramers_v_bias_corrected(adf):
    _, n, rs, cs, chi2 = _assoc_ref()
    r, c = len(rs), len(cs)
    phi2c = max(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
    rc = r - (r - 1) ** 2 / (n - 1)
    cc = c - (c - 1) ** 2 / (n - 1)
    want = math.sqrt(phi2c / min(rc - 1, cc - 1))
    assert math.isclose(
        _one(adf, "cramersVBiasCorrected(x, y)"), want, rel_tol=1e-9
    )


def test_theils_u(adf):
    obs, n, rs, cs, _ = _assoc_ref()
    hx = -sum(r / n * math.log(r / n) for r in rs)
    hxy = -sum(
        obs[i, j] / n * math.log(obs[i, j] / cs[j])
        for i in range(obs.shape[0])
        for j in range(obs.shape[1])
        if obs[i, j] > 0
    )
    want = (hx - hxy) / hx
    assert math.isclose(_one(adf, "theilsU(x, y)"), want, rel_tol=1e-9)


def test_contingency_coefficient(adf):
    _, n, _, _, chi2 = _assoc_ref()
    want = math.sqrt(chi2 / (chi2 + n))
    assert math.isclose(
        _one(adf, "contingency(x, y)"), want, rel_tol=1e-9
    )


def test_association_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("a", "p")], "x string, y string"
    )
    got = run_ch_query(
        "SELECT cramersV(x, y) AS v, theilsU(x, y) AS u FROM t",
        {"t": df},
    ).collect()[0]
    assert got.v is None and got.u is None


def test_association_null_category_counts(spark):
    # NULL is its own category (the ∅null sentinel), matching the
    # oracle's GROUP BY treatment of NULL as a distinct key
    df = spark.createDataFrame(
        [("a", "p"), (None, "q"), ("a", "q"), (None, "p"), ("a", "p")],
        "x string, y string",
    )
    v = run_ch_query(
        "SELECT cramersV(x, y) AS v FROM t", {"t": df}
    ).collect()[0].v
    assert v is not None and 0.0 <= v <= 1.0


# ------------- categoricalInformationValue single-pass fold (round 12)
# The run-length fold over the sorted (cat, tag) tape must reproduce
# the reference IV (term order = ascending category, identical
# arithmetic) EXACTLY — including the edge semantics: one-class
# categories contribute 0, a group with only one tag class is NULL,
# NULL categories bucket under the sentinel.


def _iv_ref(pairs):
    import collections
    import math

    by = collections.OrderedDict()
    for c, t in sorted(
        (("∅null" if c is None else str(c)), t) for c, t in pairs
    ):
        d = by.setdefault(c, [0.0, 0.0])
        d[0 if t != 0 else 1] += 1.0
    n1 = sum(v[0] for v in by.values())
    n0 = sum(v[1] for v in by.values())
    if not (n1 > 0 and n0 > 0):
        return None
    acc = 0.0
    for c, (c1, c0) in by.items():  # ascending category order
        if c1 > 0 and c0 > 0:
            acc = acc + (c1 / n1 - c0 / n0) * math.log(
                (c1 / n1) / (c0 / n0)
            )
        else:
            acc = acc + 0.0
    return acc


@pytest.mark.parametrize(
    "pairs",
    [
        # multi-category, both classes everywhere
        [("a", 1), ("a", 0), ("b", 1), ("b", 0), ("b", 1), ("c", 0), ("c", 1)],
        # a category seen in only one class (zero term)
        [("a", 1), ("a", 0), ("only1", 1), ("only1", 1), ("b", 0), ("b", 1)],
        # single category
        [("solo", 1), ("solo", 0), ("solo", 1)],
        # NULL categories bucket together
        [(None, 1), (None, 0), ("a", 1), ("a", 0)],
    ],
)
def test_categorical_iv_single_pass_equals_reference(spark, pairs):
    tdf = spark.createDataFrame(pairs, "c string, t int")
    got = _one(tdf, "categoricalInformationValue(c, t)")
    assert got[0] == _iv_ref(pairs)  # exact doubles, not isclose


def test_categorical_iv_one_class_group_is_null(spark):
    tdf = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 1)], "c string, t int"
    )
    assert _one(tdf, "categoricalInformationValue(c, t)")[0] is None
