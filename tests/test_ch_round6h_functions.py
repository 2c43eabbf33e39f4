"""Round-6h tranche: weighted exact quantiles, one-way ANOVA,
groupArrayIntersect, sumMapFiltered, fill/split array scans, server
constants — pinned against independent Python references."""

from __future__ import annotations

import math

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql, df=None):
    if df is None:
        df = spark.createDataFrame([(1,)], "id int")
    return run_ch_query(sql, {"t": df}).collect()[0][0]


DATA = [(i, "g%d" % (i % 3), float((i * i) % 17), float(1 + i % 4))
        for i in range(1, 25)]


def _df(spark):
    return spark.createDataFrame(DATA, "id int, g string, v double, w double")


# --- quantileExactWeighted -------------------------------------------------


def _qew(pairs, level):
    pairs = sorted(pairs)
    total = sum(w for _, w in pairs)
    thr = level * total
    cum = 0.0
    for v, w in pairs:
        cum += w
        if cum >= thr:
            return v
    return pairs[-1][0]


@pytest.mark.parametrize("level", [0.0, 0.25, 0.5, 0.75, 0.9, 1.0])
def test_quantile_exact_weighted(spark, level):
    got = _one(
        spark,
        f"SELECT quantileExactWeighted({level})(v, w) FROM t",
        _df(spark),
    )
    want = _qew([(r[2], r[3]) for r in DATA], level)
    assert got == pytest.approx(want)


def test_quantiles_exact_weighted_multi(spark):
    got = _one(
        spark,
        "SELECT quantilesExactWeighted(0.25, 0.5, 0.75)(v, w) FROM t",
        _df(spark),
    )
    pairs = [(r[2], r[3]) for r in DATA]
    assert got == [_qew(pairs, q) for q in (0.25, 0.5, 0.75)]


def test_quantile_exact_weighted_unit_weights_is_exact(spark):
    # all weights 1: must agree with the unweighted exact low edge
    got = _one(
        spark,
        "SELECT quantileExactWeighted(0.5)(v, 1) FROM t",
        _df(spark),
    )
    vals = sorted(r[2] for r in DATA)
    total = len(vals)
    cum, want = 0, None
    for v in vals:
        cum += 1
        if cum >= 0.5 * total:
            want = v
            break
    assert got == pytest.approx(want)


# --- analysisOfVariance ----------------------------------------------------


def test_anova_f_statistic(spark):
    got = run_ch_query(
        "SELECT analysisOfVariance(v, g) AS a FROM t", {"t": _df(spark)}
    ).collect()[0].a
    groups: dict[str, list[float]] = {}
    for _, g, v, _w in DATA:
        groups.setdefault(g, []).append(v)
    n = len(DATA)
    k = len(groups)
    mean = sum(v for _, _, v, _ in DATA) / n
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - mean) ** 2 for vs in groups.values()
    )
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2
        for vs in groups.values()
        for v in vs
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.f_statistic == pytest.approx(f, rel=1e-10)
    assert 0.0 <= got.p_value <= 1.0
    # scipy.stats.f.sf(f, 2, 21) = 0.4462...; Wilson-Hilferty lands
    # within ~0.01 of the exact tail here
    assert got.p_value == pytest.approx(0.4462, abs=0.02)


def test_anova_separated_groups_small_p(spark):
    df = spark.createDataFrame(
        [(float(i % 3) * 100 + i * 0.01, "g%d" % (i % 3))
         for i in range(30)],
        "v double, g string",
    )
    got = run_ch_query(
        "SELECT analysisOfVariance(v, g) AS a FROM t", {"t": df}
    ).collect()[0].a
    assert got.f_statistic > 1000
    assert got.p_value < 1e-6


# --- groupArrayIntersect / sumMapFiltered ---------------------------------


def test_group_array_intersect(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4],), ([2, 3, 4, 5],), ([0, 2, 4, 9],)],
        "arr array<int>",
    )
    assert _one(spark, "SELECT groupArrayIntersect(arr) FROM t", df) == [
        2,
        4,
    ]


def test_sum_map_filtered(spark):
    got = run_ch_query(
        "SELECT sumMapFiltered([0, 2])([id % 3, 3], [1, 10]) AS m FROM t",
        {"t": _df(spark)},
    ).collect()[0].m
    # keys: id%3 (0,1,2) and 3; only 0 and 2 survive the filter
    k0 = sum(1 for i, *_ in DATA if i % 3 == 0)
    k2 = sum(1 for i, *_ in DATA if i % 3 == 2)
    assert list(got[0]) == [0, 2]
    assert list(got[1]) == [k0, k2]


# --- fill / split scans ----------------------------------------------------


def test_array_fill_and_reverse_fill(spark):
    assert _one(
        spark, "SELECT arrayFill(x -> x > 0, [1, 0, 0, 5, 0])"
    ) == [1, 1, 1, 5, 5]
    assert _one(
        spark, "SELECT arrayFill(x -> x > 0, [0, 0, 7])"
    ) == [0, 0, 7]
    assert _one(
        spark,
        "SELECT arrayReverseFill(x -> x > 0, [0, 1, 0, 0, 5, 0])",
    ) == [1, 1, 5, 5, 5, 0]


def test_array_split_matches_ch_docs(spark):
    # the exact examples from the CH documentation
    assert _one(
        spark,
        "SELECT arraySplit((x, y) -> y, [1, 2, 3, 4, 5], [1, 0, 0, 1, 0])",
    ) == [[1, 2, 3], [4, 5]]
    assert _one(
        spark,
        "SELECT arrayReverseSplit((x, y) -> y, [1, 2, 3, 4, 5],"
        " [1, 0, 0, 1, 0])",
    ) == [[1], [2, 3, 4], [5]]
    assert _one(spark, "SELECT arraySplit(x -> 1, [1, 2, 3])") == [
        [1],
        [2],
        [3],
    ]


# --- string / misc tail ----------------------------------------------------


def test_has_subsequence(spark):
    cases = {
        ("hello world", "hlw"): True,
        ("abc", "acb"): False,
        ("hello", ""): True,
        ("", "a"): False,
        ("abc", "abc"): True,
    }
    for (h, n), want in cases.items():
        got = _one(spark, f"SELECT hasSubsequence('{h}', '{n}')")
        assert got == want, (h, n)
    assert _one(
        spark, "SELECT hasSubsequenceCaseInsensitive('Hello', 'HO')"
    )


def test_extract_all_groups(spark):
    gh = _one(
        spark,
        "SELECT extractAllGroupsHorizontal('k=1, q=2, z=3',"
        " '(\\\\w)=(\\\\d)')",
    )
    assert gh == [["k", "q", "z"], ["1", "2", "3"]]
    gv = _one(
        spark,
        "SELECT extractAllGroupsVertical('k=1, q=2, z=3',"
        " '(\\\\w)=(\\\\d)')",
    )
    assert gv == [["k", "1"], ["q", "2"], ["z", "3"]]


def test_to_start_of_n_minutes(spark):
    for fn, want in [
        ("toStartOfFiveMinutes", "12:35:00"),
        ("toStartOfTenMinutes", "12:30:00"),
        ("toStartOfFifteenMinutes", "12:30:00"),
    ]:
        got = _one(
            spark,
            f"SELECT {fn}(toDateTime('2024-03-10 12:37:44'))",
        )
        assert got.strftime("%H:%M:%S") == want, fn


def test_server_constants(spark):
    row = run_ch_query(
        "SELECT version() AS v, hostName() AS h, currentDatabase() AS d,"
        " currentUser() AS u, serverUUID() AS su, uptime() AS up"
        " FROM t",
        {"t": spark.createDataFrame([(1,)], "id int")},
    ).collect()[0]
    assert "baseline-magician-spark" in row.v
    assert row.h and row.d == "default" and row.u == "default"
    assert len(row.su) == 36 and row.up >= 0


def test_array_partial_sort(spark):
    assert _one(spark, "SELECT arrayPartialSort(2, [5, 1, 4, 2])") == [
        1, 2, 4, 5,
    ]
    assert _one(
        spark, "SELECT arrayPartialReverseSort(2, [5, 1, 4, 2])"
    ) == [5, 4, 2, 1]


def test_non_negative_derivative(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "2024-01-01 00:00:00"),
         (1, 25.0, "2024-01-01 00:00:10"),
         (1, 20.0, "2024-01-01 00:00:20"),
         (2, 5.0, "2024-01-01 00:00:00"),
         (2, 65.0, "2024-01-01 00:01:00")],
        "g int, v double, tss string",
    )
    rows = run_ch_query(
        """SELECT g, v,
        nonNegativeDerivative(v, toDateTime(tss))
          OVER (PARTITION BY g ORDER BY tss) AS d,
        nonNegativeDerivative(v, toDateTime(tss), INTERVAL 1 MINUTE)
          OVER (PARTITION BY g ORDER BY tss) AS dm
        FROM t ORDER BY g, tss""",
        {"t": df},
    ).collect()
    got = [(r.g, r.d, r.dm) for r in rows]
    assert got == [
        (1, 0.0, 0.0),   # first row of partition
        (1, 1.5, 90.0),  # +15 over 10s
        (1, 0.0, 0.0),   # negative clamps
        (2, 0.0, 0.0),
        (2, 1.0, 60.0),  # +60 over 60s
    ]


# --- review regressions: NULL and degenerate-input handling ---------------


def test_mean_z_test_skips_null_values(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (None, 0), (3.0, 1), (5.0, 1)],
        "v double, grp int",
    )
    got = run_ch_query(
        "SELECT meanZTest(1.0, 1.0, 0.95)(v, grp) AS r FROM t",
        {"t": df},
    ).collect()[0].r
    # NULL row must not count: m0 = 1.0 (not 0.5)
    se = math.sqrt(1.0 / 1 + 1.0 / 2)
    assert got.z_statistic == pytest.approx((1.0 - 4.0) / se)


def test_quantile_exact_weighted_skips_nulls(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (1.0, 1.0), (2.0, 1.0), (3.0, 1.0)],
        "v double, w double",
    )
    got = run_ch_query(
        "SELECT quantileExactWeighted(0.5)(v, w) AS q FROM t",
        {"t": df},
    ).collect()[0].q
    # total weight is 3 (NULL row excluded): threshold 1.5 -> 2.0
    assert got == 2.0


def test_group_array_intersect_all_null_group(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None)], "g int, arr array<int>"
    )
    got = run_ch_query(
        "SELECT g, groupArrayIntersect(arr) AS i FROM t GROUP BY g",
        {"t": df},
    ).collect()[0].i
    assert got is None  # no ANSI slice crash


def test_stat_tape_folds_skip_null_pairs(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (None, 0), (2.0, 1), (4.0, 1), (6.0, 0)],
        "v double, grp int",
    )
    got = run_ch_query(
        "SELECT tupleElement(mannWhitneyUTest(v, grp),"
        " 'u_statistic') AS u FROM t",
        {"t": df},
    ).collect()[0].u
    # sample 0 = {1, 6}, sample 1 = {2, 4}: ranks 1,4 vs 2,3
    # U0 = R0 - n0(n0+1)/2 = (1+4) - 3 = 2
    assert got == pytest.approx(2.0)
