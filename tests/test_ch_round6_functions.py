"""Round-6 CH function tranche: everyday names from the public
function reference that the coverage sweep found missing — string
formatting, OrNull/OrZero conversions, hashes, geo, bit aggregates,
parametric uniqUpTo/quantileGK.
"""

from __future__ import annotations

import math

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5, "12", 3.7, "2024-03-15"),
            (2, "b", 6, "x9", -2.1, "2024-03-16"),
            (3, "a", 5, "7", 0.0, "bad-date"),
            (4, "a", 12, None, 9.9, "2024-04-01"),
        ],
        "id int, k string, v int, s string, f double, ds string",
    )


def _one(tdf, expr_sql):
    return run_ch_query(
        f"SELECT {expr_sql} AS x FROM t WHERE id = 1", {"t": tdf}
    ).collect()[0].x


def test_format_and_concat_ws(tdf):
    assert _one(tdf, "format('{}-{}', k, v)") == "a-5"
    assert _one(tdf, "format('{1}/{0}', k, v)") == "5/a"
    assert _one(tdf, "concatWithSeparator('_', k, toString(v))") == "a_5"


def test_readable_formatting(tdf):
    assert _one(tdf, "formatReadableSize(1024)") == "1.00 KiB"
    assert _one(tdf, "formatReadableSize(123)") == "123.00 B"
    assert _one(tdf, "formatReadableSize(1536 * 1024)") == "1.50 MiB"
    assert _one(tdf, "formatReadableQuantity(1500000)") == "1.50 million"
    assert _one(tdf, "formatReadableQuantity(12)") == "12.00"


def test_date_names(tdf):
    assert _one(tdf, "monthName(toDate(ds))") == "March"
    assert _one(tdf, "dateName('weekday', toDate(ds))") == "Friday"
    assert _one(tdf, "dateName('year', toDate(ds))") == "2024"
    assert _one(tdf, "toString(toLastDayOfMonth(toDate(ds)))") == (
        "2024-03-31"
    )


def test_or_null_or_zero_conversions(tdf):
    rows = run_ch_query(
        "SELECT id, toInt64OrNull(s) AS a, toInt64OrZero(s) AS b, "
        "toFloat64OrNull(s) AS c, toDateOrNull(ds) AS d "
        "FROM t ORDER BY id",
        {"t": tdf},
    ).collect()
    assert [r.a for r in rows] == [12, None, 7, None]
    assert [r.b for r in rows] == [12, 0, 7, 0]
    assert rows[1].c is None and rows[0].c == 12.0
    assert rows[2].d is None and str(rows[0].d) == "2024-03-15"


def test_decimal_and_typename(tdf):
    df = run_ch_query(
        "SELECT toDecimal64(f, 2) AS d, toTypeName(v) AS tn FROM t",
        {"t": tdf},
    )
    assert dict(df.dtypes)["d"] == "decimal(18,2)"
    assert df.collect()[0].tn == "int"


def test_hashes_distinct_families(tdf):
    row = run_ch_query(
        "SELECT xxHash64(k) AS a, sipHash64(k) AS b, cityHash64(k) AS c, "
        "bin(v) AS bn, bitmaskToList(v) AS bl FROM t WHERE id = 1",
        {"t": tdf},
    ).collect()[0]
    assert len({row.a, row.b, row.c}) == 3  # families independent
    assert row.bn == "101" and row.bl == "1,4"


def test_is_null_spellings_and_empty_arrays(tdf):
    rows = run_ch_query(
        "SELECT id, isNull(s) AS n, isNotNull(s) AS nn, "
        "emptyArrayInt64() AS e FROM t ORDER BY id",
        {"t": tdf},
    ).collect()
    assert [r.n for r in rows] == [False, False, False, True]
    assert rows[0].e == []


def test_array_enumerate_dense_and_reverse_sort(tdf):
    row = run_ch_query(
        "SELECT arrayEnumerateDense([10, 20, 10, 30]) AS d, "
        "arrayReverseSort([3, 1, 2]) AS r FROM t WHERE id = 1",
        {"t": tdf},
    ).collect()[0]
    assert row.d == [1, 2, 1, 3]
    assert row.r == [3, 2, 1]


def test_great_circle_distance(tdf):
    # Paris (2.3522, 48.8566) to London (-0.1276, 51.5072) ~ 334 km
    d = _one(
        tdf,
        "greatCircleDistance(2.3522, 48.8566, 0.0 - 0.1276, 51.5072)",
    )
    assert 330_000 < d < 350_000


def test_bit_aggregates_and_sum_count(tdf):
    row = run_ch_query(
        "SELECT groupBitAnd(v) AS ba, groupBitOr(v) AS bo, "
        "groupBitXor(v) AS bx, tupleElement(sumCount(v), 1) AS s, "
        "tupleElement(sumCount(v), 2) AS c, sumKahan(v) AS sk "
        "FROM t WHERE k = 'a'",
        {"t": tdf},
    ).collect()[0]
    assert row.ba == 5 & 5 & 12 and row.bo == 5 | 12
    assert row.bx == 5 ^ 5 ^ 12
    assert row.s == 22 and row.c == 3 and row.sk == 22


def test_single_value_or_null_and_any_heavy(tdf):
    rows = run_ch_query(
        "SELECT k, singleValueOrNull(v) AS sv, anyHeavy(v) AS ah, "
        "firstValue(id) AS fv, lastValue(id) AS lv "
        "FROM t GROUP BY k ORDER BY k",
        {"t": tdf},
    ).collect()
    assert rows[0].sv is None  # k='a' has v in {5, 12}
    assert rows[1].sv == 6
    assert rows[0].ah == 5  # mode of (5, 5, 12)


def test_skew_samp_formula(spark):
    tdf2 = spark.createDataFrame(
        [(float(x),) for x in [1, 2, 2, 3, 10]], "x double"
    )
    got = run_ch_query(
        "SELECT skewSamp(x) AS s FROM t", {"t": tdf2}
    ).collect()[0].s
    xs = [1.0, 2.0, 2.0, 3.0, 10.0]
    n = len(xs)
    mu = sum(xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    s_samp = math.sqrt(sum((x - mu) ** 2 for x in xs) / (n - 1))
    assert got == pytest.approx(m3 / s_samp**3, rel=1e-9)


def test_uniq_up_to_and_quantile_gk(tdf):
    rows = run_ch_query(
        "SELECT k, uniqUpTo(1)(v) AS u1, uniqUpTo(5)(v) AS u5, "
        "quantileGK(200, 0.5)(v) AS med "
        "FROM t GROUP BY k ORDER BY k",
        {"t": tdf},
    ).collect()
    assert rows[0].u1 == 2  # saturates at n+1
    assert rows[0].u5 == 2
    assert rows[1].u1 == 1
    assert rows[0].med in (5, 12)


def test_array_fold_and_sort_by_key(tdf):
    row = run_ch_query(
        "SELECT arrayFold((acc, x) -> acc * 10 + x, [1, 2, 3], 0) AS f, "
        "arraySort(x -> 0 - x, [3, 1, 2]) AS s, "
        "arrayReverseSort(x -> x, [3, 1, 2]) AS r "
        "FROM t WHERE id = 1",
        {"t": tdf},
    ).collect()[0]
    assert row.f == 123
    assert row.s == [3, 2, 1]
    assert row.r == [3, 2, 1]


def test_topk_weighted(spark):
    tdf2 = spark.createDataFrame(
        [("a", 1), ("b", 10), ("a", 2), ("c", 100)], "v string, w int"
    )
    row = run_ch_query(
        "SELECT topKWeighted(2)(v, w) AS t FROM t", {"t": tdf2}
    ).collect()[0]
    assert row.t == ["c", "b"]


def test_vector_distance_family(tdf):
    row = run_ch_query(
        "SELECT dotProduct([1, 2, 3], [4, 5, 6]) AS dp, "
        "L1Distance([1, 2], [4, 6]) AS l1, "
        "L2Distance([0, 0], [3, 4]) AS l2, "
        "LinfDistance([1, 2], [4, 10]) AS li, "
        "L2Norm([3, 4]) AS n2, "
        "cosineDistance([1, 0], [0, 1]) AS cd, "
        "cosineDistance([2, 0], [5, 0]) AS cs "
        "FROM t WHERE id = 1",
        {"t": tdf},
    ).collect()[0]
    assert row.dp == 32.0 and row.l1 == 7.0 and row.l2 == 5.0
    assert row.li == 8.0 and row.n2 == 5.0
    assert row.cd == pytest.approx(1.0) and row.cs == pytest.approx(0.0)


def test_array_auc(tdf):
    row = run_ch_query(
        "SELECT arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) AS a, "
        "arrayAUC([0.5, 0.5], [0, 1]) AS tie, "
        "arrayAUC([0.5, 0.6], [1, 1]) AS onecls "
        "FROM t WHERE id = 1",
        {"t": tdf},
    ).collect()[0]
    assert row.a == pytest.approx(0.75)
    assert row.tie == pytest.approx(0.5)
    assert row.onecls is None


def _lttb_ref(points, n):
    """Reference LTTB (Steinarsson 2013), greedy over sorted points."""
    pts = sorted(points)
    total = len(pts)
    if total <= n:
        return pts
    mid = total - 2
    nb = n - 2
    starts = [2 + (i - 1) * mid // nb for i in range(1, nb + 2)]
    out = [pts[0]]
    for i in range(1, nb + 1):
        lo, hi = starts[i - 1], starts[i]  # 1-based inclusive/exclusive
        if i < nb:
            seg = pts[starts[i] - 1 : starts[i + 1] - 1]
            nx = (sum(p[0] for p in seg) / len(seg),
                  sum(p[1] for p in seg) / len(seg))
        else:
            nx = pts[-1]
        prev = out[-1]
        best, best_a = None, -1.0
        for c in pts[lo - 1 : hi - 1]:
            a = abs((prev[0] - nx[0]) * (c[1] - prev[1])
                    - (prev[0] - c[0]) * (nx[1] - prev[1]))
            if a > best_a:
                best, best_a = c, a
        out.append(best)
    out.append(pts[-1])
    return out


def test_lttb_matches_reference(spark):
    import random

    rng = random.Random(42)
    data = [(float(i), rng.uniform(-5, 5)) for i in range(40)]
    tdf2 = spark.createDataFrame(data, "x double, y double")
    got = run_ch_query(
        "SELECT largestTriangleThreeBuckets(10)(x, y) AS pts FROM t",
        {"t": tdf2},
    ).collect()[0].pts
    ref = _lttb_ref(data, 10)
    assert [(p.x, p.y) for p in got] == ref
    assert len(got) == 10
    assert got[0].x == 0.0 and got[-1].x == 39.0


def test_lttb_small_group_passthrough(spark):
    tdf2 = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 3.0)], "x double, y double"
    )
    got = run_ch_query(
        "SELECT lttb(5)(x, y) AS pts FROM t", {"t": tdf2}
    ).collect()[0].pts
    assert [(p.x, p.y) for p in got] == [(1.0, 2.0), (2.0, 3.0)]


def test_median_aliases_and_group_array_sorted(tdf):
    rows = run_ch_query(
        "SELECT k, medianExact(v) AS me, medianTiming(v) AS mt, "
        "groupArraySorted(2)(v) AS g2, approx_top_k(2)(v) AS tk "
        "FROM t GROUP BY k ORDER BY k",
        {"t": tdf},
    ).collect()
    assert rows[0].me == 5.0 and rows[0].mt == 5
    assert rows[0].g2 == [5, 5]
    assert rows[0].tk[0] == 5  # most frequent first
    assert rows[1].g2 == [6]


def test_transform_round_bar(tdf):
    rows = run_ch_query(
        "SELECT id, transform(k, ['a', 'b'], ['alpha', 'beta']) AS tk, "
        "transform(v, [5], [50], 0 - 1) AS tv, "
        "roundBankers(2.5) AS rb, roundBankers(3.5) AS rb2, "
        "roundDown(v, [0, 4, 10]) AS rd, "
        "roundToExp2(v) AS r2, intExp2(v) AS e2 "
        "FROM t ORDER BY id",
        {"t": tdf},
    ).collect()
    assert rows[0].tk == "alpha" and rows[1].tk == "beta"
    assert rows[0].tv == 50 and rows[1].tv == -1
    assert rows[0].rb == 2.0 and rows[0].rb2 == 4.0  # banker's
    assert rows[0].rd == 4 and rows[3].rd == 10
    assert rows[0].r2 == 4 and rows[0].e2 == 32
    bar = run_ch_query(
        "SELECT bar(3, 0, 4, 4) AS b FROM t WHERE id = 1", {"t": tdf}
    ).collect()[0].b
    assert bar == "███"  # 3/4 of width 4 = 3 full blocks
