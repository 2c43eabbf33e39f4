"""Round-6i tranche: arithmetic/bucket names, array similarity and
Levenshtein, bit Hamming, proportions z-test, Tukey outlier scores,
accurateCast — pinned against Python references."""

from __future__ import annotations

import math
import random

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql):
    df = spark.createDataFrame([(1,)], "id int")
    return run_ch_query(f"{sql} FROM t", {"t": df}).collect()[0][0]


def test_positive_modulo(spark):
    assert _one(spark, "SELECT positiveModulo(-7, 3) AS r") == 2
    assert _one(spark, "SELECT positiveModulo(7, 3) AS r") == 1
    assert _one(spark, "SELECT positiveModulo(-9, 3) AS r") == 0


def test_width_bucket(spark):
    assert _one(spark, "SELECT widthBucket(5.5, 0, 10, 5) AS r") == 3
    assert _one(spark, "SELECT widthBucket(-1, 0, 10, 5) AS r") == 0
    assert _one(spark, "SELECT widthBucket(11, 0, 10, 5) AS r") == 6


def test_array_jaccard(spark):
    assert _one(
        spark, "SELECT arrayJaccardIndex([1,2,3], [2,3,4]) AS r"
    ) == pytest.approx(0.5)
    assert _one(spark, "SELECT arrayJaccardIndex([], []) AS r") == 0.0
    assert _one(
        spark, "SELECT arrayJaccardIndex([1], [1]) AS r"
    ) == pytest.approx(1.0)


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(
                min(cur[-1] + 1, prev[j] + 1, prev[j - 1] + (x != y))
            )
        prev = cur
    return prev[-1]


def test_array_levenshtein_random(spark):
    rng = random.Random(99)
    cases = [
        (
            [rng.randrange(4) for _ in range(rng.randrange(7))],
            [rng.randrange(4) for _ in range(rng.randrange(7))],
        )
        for _ in range(25)
    ]
    df = spark.createDataFrame(cases, "a array<int>, b array<int>")
    got = run_ch_query(
        "SELECT a, b, arrayLevenshteinDistance(a, b) AS d FROM t",
        {"t": df},
    ).collect()
    for r in got:
        assert r.d == _py_lev(list(r.a), list(r.b)), (r.a, r.b)


def test_bit_hamming_distance(spark):
    assert _one(spark, "SELECT bitHammingDistance(111, 109) AS r") == 1
    assert _one(spark, "SELECT bitHammingDistance(0, -1) AS r") == 64
    assert _one(spark, "SELECT bitHammingDistance(5, 5) AS r") == 0


def test_proportions_z_test(spark):
    got = run_ch_query(
        "SELECT proportionsZTest(40, 30, 100, 100, 0.9, 'pooled')"
        " AS r FROM t",
        {"t": spark.createDataFrame([(1,)], "id int")},
    ).collect()[0].r
    p1, p2 = 0.4, 0.3
    pp = 70 / 200
    se = math.sqrt(pp * (1 - pp) * (2 / 100))
    z = (p1 - p2) / se
    assert got.z_statistic == pytest.approx(z, rel=1e-12)
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert got.p_value == pytest.approx(p, abs=1e-6)
    se_u = math.sqrt(0.4 * 0.6 / 100 + 0.3 * 0.7 / 100)
    zq = 1.6448536269514722
    assert got.confidence_interval_low == pytest.approx(
        0.1 - zq * se_u, abs=1e-9
    )
    assert got.confidence_interval_high == pytest.approx(
        0.1 + zq * se_u, abs=1e-9
    )


def test_series_outliers_tukey(spark):
    got = _one(
        spark, "SELECT seriesOutliersDetectTukey([1,2,3,4,5,100]) AS r"
    )
    # sorted series 1..5,100: q1 = 2.25, q3 = 4.75 (R-7), iqr = 2.5,
    # fences [-1.5, 8.5]; only 100 scores, at 100 - 8.5 = 91.5
    assert got[:5] == [0.0] * 5
    assert got[5] == pytest.approx(91.5)
    low = _one(
        spark,
        "SELECT seriesOutliersDetectTukey([-50, 1, 2, 3, 4, 5]) AS r",
    )
    assert low[0] < 0 and low[1:] == [0.0] * 5


def test_accurate_cast(spark):
    assert _one(spark, "SELECT accurateCast(3.7, 'Int64') AS r") == 3
    assert _one(spark, "SELECT accurateCastOrNull('xx', 'Int64') AS r") is None
    assert _one(
        spark, "SELECT accurateCastOrNull('12', 'Int64') AS r"
    ) == 12
    assert _one(
        spark, "SELECT accurateCast([1, 2], 'Array(Float64)') AS r"
    ) == [1.0, 2.0]


def test_resample_combinator(spark):
    df = spark.createDataFrame(
        [(i, float(i), i % 30) for i in range(100)],
        "id int, v double, k int",
    )
    got = run_ch_query(
        "SELECT countResample(0, 30, 10)(v, k) AS c,"
        " sumResample(0, 30, 10)(v, k) AS s,"
        " minResample(0, 30, 10)(v, k) AS m FROM t",
        {"t": df},
    ).collect()[0]
    rows = [(i, float(i), i % 30) for i in range(100)]
    want_c = [
        sum(1 for _, _, k in rows if lo <= k < lo + 10)
        for lo in (0, 10, 20)
    ]
    want_s = [
        sum(v for _, v, k in rows if lo <= k < lo + 10)
        for lo in (0, 10, 20)
    ]
    assert list(got.c) == want_c
    assert list(got.s) == pytest.approx(want_s)
    assert list(got.m) == [0.0, 10.0, 20.0]


def test_resample_empty_buckets(spark):
    df = spark.createDataFrame([(1.0, 5)], "v double, k int")
    got = run_ch_query(
        "SELECT sumResample(0, 30, 10)(v, k) AS s,"
        " countResample(0, 30, 10)(v, k) AS c,"
        " avgResample(0, 30, 10)(v, k) AS a,"
        " minResample(0, 30, 10)(v, k) AS mn,"
        " maxResample(0, 30, 10)(v, k) AS mx FROM t",
        {"t": df},
    ).collect()[0]
    # CH -Resample fills empty buckets with the aggregate state's
    # DEFAULT value (0 for every numeric aggregate), never NULL
    assert list(got.s) == [1.0, 0.0, 0.0]
    assert list(got.c) == [1, 0, 0]
    assert list(got.a) == [1.0, 0.0, 0.0]
    assert list(got.mn) == [1.0, 0.0, 0.0]
    assert list(got.mx) == [1.0, 0.0, 0.0]


def test_count_resample_one_arg(spark):
    # CH's one-column spelling: countResample(start, end, step)(key)
    df = spark.createDataFrame(
        [(i, i % 30) for i in range(100)], "id int, k int"
    )
    got = run_ch_query(
        "SELECT countResample(0, 30, 10)(k) AS c FROM t", {"t": df}
    ).collect()[0]
    assert list(got.c) == [
        sum(1 for i in range(100) if lo <= i % 30 < lo + 10)
        for lo in (0, 10, 20)
    ]


def test_resample_bucket_cap(spark):
    df = spark.createDataFrame([(1.0, 5)], "v double, k int")
    with pytest.raises(Exception, match="4096|cap"):
        run_ch_query(
            "SELECT sumResample(0, 100000, 1)(v, k) AS s FROM t",
            {"t": df},
        ).collect()


def test_series_outliers_tukey_empty_array(spark):
    got = _one(
        spark,
        "SELECT seriesOutliersDetectTukey(arrayFilter(x -> x > 99,"
        " [1, 2])) AS r",
    )
    assert got == []
