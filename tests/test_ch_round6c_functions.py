"""Round-6c tranche: string similarity (functions/text_similarity.py),
readable formatting, binary/char utilities, array rotate/shift, and
calendar/epoch bridges. damerauLevenshtein is pinned against an
independent Python OSA implementation (DuckDB's damerau_levenshtein is
the FULL variant, so the oracle track can't carry it).
"""

from __future__ import annotations

import math

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, expr_sql):
    df = spark.createDataFrame([(1,)], "id int")
    return (
        run_ch_query(f"SELECT {expr_sql} AS r FROM t", {"t": df})
        .collect()[0]
        .r
    )


def ref_osa(a: str, b: str) -> int:
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + cost,
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[n][m]


@pytest.mark.parametrize(
    "a,b",
    [
        ("ca", "abc"),        # OSA=3 (full Damerau=2) — the tell-apart
        ("abcd", "acbd"),     # one transposition
        ("kitten", "sitting"),
        ("", "xyz"),
        ("xyz", ""),
        ("", ""),
        ("banana", "ananas"),
        ("transpose", "transpsoe"),
    ],
)
def test_damerau_levenshtein_osa(spark, a, b):
    got = _one(spark, f"damerauLevenshtein('{a}', '{b}')")
    assert got == ref_osa(a, b)


def test_edit_distance(spark):
    assert _one(spark, "editDistance('kitten', 'sitting')") == 3
    assert _one(spark, "levenshteinDistance('abc', 'abc')") == 0


def test_string_jaccard(spark):
    assert _one(spark, "stringJaccardIndex('abc', 'bcd')") == 0.5
    assert _one(spark, "stringJaccardIndex('', '')") == 0.0


def test_byte_hamming(spark):
    assert _one(spark, "byteHammingDistance('karolin', 'kathrin')") == 3
    # overhang counts as distance
    assert _one(spark, "byteHammingDistance('abc', 'abcde')") == 2


def test_ngram_distance(spark):
    assert _one(spark, "ngramDistance('hello world', 'hello world')") == 0.0
    assert _one(spark, "ngramDistance('aaaa', 'bbbb')") == 1.0
    mid = _one(spark, "ngramDistance('hello world', 'hello there')")
    assert 0.0 < mid < 1.0


def test_soundex_and_difference(spark):
    assert _one(spark, "soundex('Robert')") == "R163"
    assert _one(spark, "difference('Robert', 'Rupert')") == 4


def test_char_space_unbin(spark):
    assert _one(spark, "char(72, 105)") == "Hi"
    assert _one(spark, "space(3)") == "   "
    assert _one(spark, "unbin('0100100001101001')") == "Hi"
    # ragged leading group is left-padded
    assert _one(spark, "unbin('100100001101001')") == "Hi"


def test_readable_formats(spark):
    assert (
        _one(spark, "formatReadableTimeDelta(90061)")
        == "1 day, 1 hour, 1 minute, 1 second"
    )
    assert _one(spark, "formatReadableTimeDelta(0)") == "0 seconds"
    assert (
        _one(spark, "formatReadableTimeDelta(7322, 'hours')")
        == "2 hours, 2 minutes, 2 seconds"
    )
    assert _one(spark, "formatReadableDecimalSize(1500000)") == "1.50 MB"


def test_regexp_extraction(spark):
    assert _one(
        spark, r"regexpExtract('ab12cd', '([a-z]+)(\\d+)', 2)"
    ) == "12"
    assert _one(spark, r"regexpExtract('ab12cd', '(\\d+)')") == "12"
    assert _one(
        spark, r"extractGroups('ab12cd', '([a-z]+)(\\d+)')"
    ) == ["ab", "12"]
    assert _one(spark, r"splitByRegexp('\\d+', 'a1b22c')") == [
        "a", "b", "c",
    ]
    assert _one(spark, "alphaTokens('ab.cd, ef')") == ["ab", "cd", "ef"]


def test_multi_search_all_positions(spark):
    assert _one(
        spark, "multiSearchAllPositions('hello', ['l', 'z', 'o'])"
    ) == [3, 0, 5]


def test_array_rotate_shift(spark):
    assert _one(spark, "arrayRotateLeft([1,2,3,4,5], 2)") == [3, 4, 5, 1, 2]
    assert _one(spark, "arrayRotateLeft([1,2,3], -1)") == [3, 1, 2]
    assert _one(spark, "arrayRotateRight([1,2,3,4,5], 1)") == [5, 1, 2, 3, 4]
    assert _one(spark, "arrayShiftLeft([1,2,3,4], 2, 0)") == [3, 4, 0, 0]
    assert _one(spark, "arrayShiftRight([1,2,3,4], 1, 9)") == [9, 1, 2, 3]


def test_age_truncates_complete_units(spark):
    assert _one(
        spark,
        "age('year', toDateTime('2020-03-01 00:00:00'),"
        " toDateTime('2024-02-29 00:00:00'))",
    ) == 3
    assert _one(
        spark,
        "age('day', toDateTime('2024-01-01 12:00:00'),"
        " toDateTime('2024-01-03 11:00:00'))",
    ) == 1
    # signed: truncation toward zero, not floor
    assert _one(
        spark,
        "age('second', toDateTime('2024-01-02 00:00:00'),"
        " toDateTime('2024-01-01 23:59:00'))",
    ) == -60


def test_time_diff_and_mjd(spark):
    assert _one(
        spark,
        "timeDiff(toDateTime('2024-01-01 00:00:00'),"
        " toDateTime('2024-01-01 00:01:30'))",
    ) == 90
    assert _one(spark, "toModifiedJulianDay(toDate('1858-11-18'))") == 1
    assert str(_one(spark, "fromModifiedJulianDay(0)")) == "1858-11-17"


def test_epoch64_bridges(spark):
    assert _one(
        spark,
        "toUnixTimestamp64Milli(toDateTime('1970-01-01 00:00:01'))",
    ) == 1000
    assert _one(
        spark,
        "toUnixTimestamp64Milli(fromUnixTimestamp64Milli(1234567890123))",
    ) == 1234567890123
    assert _one(
        spark,
        "toUnixTimestamp64Micro(fromUnixTimestamp64Micro(1234567890123456))",
    ) == 1234567890123456


def test_snowflake_roundtrip(spark):
    assert _one(
        spark,
        "toUnixTimestamp64Milli(snowflakeToDateTime("
        "dateTimeToSnowflake(fromUnixTimestamp64Milli(1600000000000))))",
    ) == 1600000000000


def test_jaro_classic_vectors(spark):
    assert math.isclose(
        _one(spark, "jaroSimilarity('MARTHA', 'MARHTA')"),
        0.9444444444444445,
    )
    assert math.isclose(
        _one(spark, "jaroWinklerSimilarity('MARTHA', 'MARHTA')"),
        0.9611111111111111,
    )
    assert math.isclose(
        _one(spark, "jaroSimilarity('CRATE', 'TRACE')"),
        0.7333333333333334,
    )
    assert _one(spark, "jaroSimilarity('ab', 'ba')") == 0.0
    assert _one(spark, "jaroSimilarity('', '')") == 0.0


def test_jaro_winkler_boost_threshold(spark):
    # below 0.7 the prefix boost must NOT apply
    j = _one(spark, "jaroSimilarity('ABCDEF', 'ABQRST')")
    jw = _one(spark, "jaroWinklerSimilarity('ABCDEF', 'ABQRST')")
    assert j < 0.7 and jw == j


def test_jaro_differential_vs_duckdb(spark):
    """Randomized differential: our fold vs DuckDB's builtin over
    short random strings (the same oracle the driver uses)."""
    import random

    import duckdb

    rng = random.Random(20260815)
    alphabet = "abcdez"
    pairs = [
        (
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 9))),
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 9))),
        )
        for _ in range(40)
    ]
    rows = spark.createDataFrame(pairs, "a string, b string")
    got = (
        run_ch_query(
            "SELECT a, b, jaroSimilarity(a, b) AS j,"
            " jaroWinklerSimilarity(a, b) AS jw,"
            " editDistance(a, b) AS ed FROM t",
            {"t": rows},
        )
        .collect()
    )
    for r in got:
        want = duckdb.sql(
            f"SELECT jaro_similarity('{r.a}','{r.b}'),"
            f" jaro_winkler_similarity('{r.a}','{r.b}'),"
            f" levenshtein('{r.a}','{r.b}')"
        ).fetchone()
        assert math.isclose(r.j, want[0], abs_tol=1e-12), (r.a, r.b)
        assert math.isclose(r.jw, want[1], abs_tol=1e-12), (r.a, r.b)
        assert r.ed == want[2], (r.a, r.b)


def test_untuple_expands_struct(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    out = run_ch_query(
        "SELECT id AS k, untuple(tuple(id * 2, upper(s)))"
        " FROM t ORDER BY k",
        {"t": df},
    )
    assert out.columns == ["k", "col1", "col2"]
    assert [tuple(r) for r in out.collect()] == [(1, 2, "X"), (2, 4, "Y")]


def test_untuple_named_fields(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = run_ch_query(
        "SELECT untuple(geohashDecode('ezs42')) FROM t", {"t": df}
    )
    assert out.columns == ["1", "2"]
    lon, lat = out.collect()[0]
    assert abs(lon - -5.60302734375) < 1e-9
    assert abs(lat - 42.60498046875) < 1e-9


def test_untuple_rejects_scalar(spark):
    df = spark.createDataFrame([(1,)], "id int")
    import pytest as _pytest

    with _pytest.raises(Exception, match="tuple-valued"):
        run_ch_query("SELECT untuple(id) FROM t", {"t": df}).collect()


# ------------------------------------------------- round-6d tranche


def test_group_concat_and_last(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 3}") for i in range(1, 9)], "id int, s string"
    ).coalesce(1)
    got = run_ch_query(
        "SELECT groupConcat('|')(s) AS gc,"
        " groupArrayLast(3)(id) AS last3 FROM t",
        {"t": df},
    ).collect()[0]
    assert sorted(got.gc.split("|")) == sorted(
        f"v{i % 3}" for i in range(1, 9)
    )
    assert got.last3 == [6, 7, 8]


def test_quantile_exact_edges(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)], "x double"
    )
    got = run_ch_query(
        "SELECT quantileExactLow(0.5)(x) AS lo,"
        " quantileExactHigh(0.5)(x) AS hi,"
        " quantileExactLow(0.25)(x) AS q1,"
        " quantileExactHigh(0.75)(x) AS q3 FROM t",
        {"t": df},
    ).collect()[0]
    assert (got.lo, got.hi, got.q1, got.q3) == (4.0, 5.0, 2.0, 7.0)


def test_group_array_moving(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)], "x double"
    ).coalesce(1)
    got = run_ch_query(
        "SELECT groupArrayMovingSum(x) AS s,"
        " groupArrayMovingAvg(x) AS a,"
        " groupArrayMovingSum(3)(x) AS w FROM t",
        {"t": df},
    ).collect()[0]
    assert got.s == [1.0, 3.0, 6.0, 10.0, 15.0, 21.0, 28.0, 36.0]
    assert got.a == [1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5]
    assert got.w == [1.0, 3.0, 6.0, 9.0, 12.0, 15.0, 18.0, 21.0]


def test_distinct_qualified_aggregates(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "id int, k int"
    )
    got = run_ch_query(
        "SELECT countDistinct(k) AS cd, sumDistinct(k) AS sd,"
        " round(avgDistinct(k), 4) AS ad FROM t",
        {"t": df},
    ).collect()[0]
    assert (got.cd, got.sd, got.ad) == (3, 3, 1.0)


def test_date_constructors_and_day_numbers(spark):
    # toDaysSinceYearZero is MySQL TO_DAYS-compatible:
    # TO_DAYS('2008-10-07') = 733687
    assert _one(
        spark, "toDaysSinceYearZero(toDate('2008-10-07'))"
    ) == 733687
    assert (
        str(_one(spark, "fromDaysSinceYearZero(733687)")) == "2008-10-07"
    )
    assert str(_one(spark, "makeDate(2024, 2, 29)")) == "2024-02-29"
    assert _one(
        spark,
        "toYYYYMMDDhhmmss(makeDateTime(2024, 2, 29, 12, 30, 45))",
    ) == 20240229123045
    assert str(_one(spark, "YYYYMMDDToDate(20231001)")) == "2023-10-01"
    assert _one(spark, "toRelativeDayNum(toDate('1970-01-02'))") == 1
