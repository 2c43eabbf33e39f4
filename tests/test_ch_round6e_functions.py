"""Round-6e tranche: INTERVAL constructors, URL dissection
completions, JSON completions, visitParam legacy aliases, and the
special-function math family (erf/erfc/lgamma/tgamma — JVM closed
forms pinned against Python's math module)."""

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


# --- INTERVAL constructors -------------------------------------------------


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("toDateTime('2024-03-10 12:00:00') + toIntervalDay(3)",
         "2024-03-13 12:00:00"),
        ("toDateTime('2024-03-10 12:00:00') + toIntervalHour(36)",
         "2024-03-12 00:00:00"),
        ("toDateTime('2024-03-10 12:00:00') + toIntervalMinute(90)",
         "2024-03-10 13:30:00"),
        ("toDateTime('2024-03-10 12:00:00') + toIntervalSecond(61)",
         "2024-03-10 12:01:01"),
        ("toDateTime('2024-03-10 12:00:00') + toIntervalWeek(2)",
         "2024-03-24 12:00:00"),
        ("toDateTime('2024-01-31 06:00:00') + toIntervalMonth(1)",
         "2024-02-29 06:00:00"),
        ("toDateTime('2024-03-10 12:00:00') + toIntervalQuarter(1)",
         "2024-06-10 12:00:00"),
        ("toDateTime('2024-02-29 12:00:00') + toIntervalYear(1)",
         "2025-02-28 12:00:00"),
        ("toDateTime('2024-03-10 12:00:00') - toIntervalDay(10)",
         "2024-02-29 12:00:00"),
    ],
)
def test_interval_constructors(spark, expr, expected):
    got = _one(spark, expr)
    assert got.strftime("%Y-%m-%d %H:%M:%S") == expected


def test_timestamp_alias_family(spark):
    assert (
        _one(
            spark,
            "timestampAdd(DAY, 2, toDateTime('2024-01-01 00:00:00'))",
        ).strftime("%Y-%m-%d")
        == "2024-01-03"
    )
    assert (
        _one(
            spark,
            "timestampSub('hour', 6, toDateTime('2024-01-01 12:00:00'))",
        ).strftime("%H:%M")
        == "06:00"
    )
    assert (
        _one(
            spark,
            "timestampDiff('day', toDate('2024-01-01'), "
            "toDate('2024-03-01'))",
        )
        == 60
    )


# --- URL dissection completions -------------------------------------------

_URL = "'https://paul:pw@www.news.example.co.uk:8080/a/b?x=1&y=2#frag'"


@pytest.mark.parametrize(
    "fn,expected",
    [
        (f"fragment({_URL})", "frag"),
        (f"cutFragment({_URL})",
         "https://paul:pw@www.news.example.co.uk:8080/a/b?x=1&y=2"),
        (f"cutQueryStringAndFragment({_URL})",
         "https://paul:pw@www.news.example.co.uk:8080/a/b"),
        (f"netloc({_URL})", "paul:pw@www.news.example.co.uk:8080"),
        (f"pathFull({_URL})", "/a/b?x=1&y=2#frag"),
        (f"domainWithoutWWW({_URL})", "news.example.co.uk"),
        (f"firstSignificantSubdomain({_URL})", "example"),
        (f"port({_URL})", 8080),
        ("port('http://a.com/x')", 0),
        ("port('http://a.com/x', 443)", 443),
        ("fragment('http://a.com/x')", ""),
        ("netloc('www.a.com/path')", "www.a.com"),
        ("firstSignificantSubdomain('https://news.site.com/x')",
         "site"),
    ],
)
def test_url_completions(spark, fn, expected):
    assert _one(spark, fn) == expected


# --- JSON completions ------------------------------------------------------

_J = "'{\"a\": 1, \"b\": \"two\", \"arr\": [\"x\", 3, {\"k\": 4}]}'"


def test_json_extract_keys(spark):
    assert _one(spark, f"JSONExtractKeys({_J})") == ["a", "b", "arr"]
    assert _one(spark, f"JSONExtractKeys({_J}, 'arr')") is None


def test_json_extract_array_raw(spark):
    got = _one(spark, f"JSONExtractArrayRaw({_J}, 'arr')")
    assert got == ['"x"', "3", '{"k":4}']


def test_json_value_and_query(spark):
    assert _one(spark, f"JSON_VALUE({_J}, '$.b')") == "two"
    assert _one(spark, f"JSON_QUERY({_J}, '$.b')") == '["two"]'
    assert _one(spark, f"JSON_QUERY({_J}, '$.a')") == "[1]"
    assert _one(spark, f"JSON_VALUE({_J}, '$.zzz')") is None
    assert _one(spark, f"JSON_QUERY({_J}, '$.zzz')") is None


@pytest.mark.parametrize(
    "fn,expected",
    [
        (f"visitParamHas({_J}, 'a')", True),
        (f"visitParamHas({_J}, 'zzz')", False),
        (f"visitParamExtractInt({_J}, 'a')", 1),
        (f"visitParamExtractUInt({_J}, 'a')", 1),
        (f"visitParamExtractFloat({_J}, 'a')", 1.0),
        (f"visitParamExtractRaw({_J}, 'b')", '"two"'),
        ("visitParamExtractBool('{\"f\": true}', 'f')", True),
        (f"simpleJSONExtractInt({_J}, 'a')", 1),
        (f"simpleJSONHas({_J}, 'b')", True),
        (f"simpleJSONExtractFloat({_J}, 'a')", 1.0),
        (f"simpleJSONExtractRaw({_J}, 'b')", '"two"'),
        ("simpleJSONExtractBool('{\"f\": false}', 'f')", False),
    ],
)
def test_visit_param_aliases(spark, fn, expected):
    assert _one(spark, fn) == expected


# --- special-function math -------------------------------------------------


@pytest.mark.parametrize(
    "x", [-3.0, -1.5, -0.5, -0.1, 0.0, 0.1, 0.5, 1.0, 2.2, 4.0]
)
def test_erf_erfc(spark, x):
    assert _one(spark, f"erf({x})") == pytest.approx(
        math.erf(x), abs=2e-7
    )
    assert _one(spark, f"erfc({x})") == pytest.approx(
        math.erfc(x), abs=2e-7
    )


@pytest.mark.parametrize(
    "x", [0.1, 0.5, 1.0, 1.5, 2.0, 3.0, 4.5, 10.0, 30.0, -0.5, -1.5,
          -2.5]
)
def test_lgamma_tgamma(spark, x):
    assert _one(spark, f"lgamma({x})") == pytest.approx(
        math.lgamma(x), rel=1e-10, abs=1e-10
    )
    assert _one(spark, f"tgamma({x})") == pytest.approx(
        math.gamma(x), rel=1e-10
    )


def test_tgamma_integer_identity(spark):
    # Γ(n) = (n-1)!
    assert _one(spark, "tgamma(6)") == pytest.approx(120.0, rel=1e-12)
    assert _one(spark, "lgamma(1)") == pytest.approx(0.0, abs=1e-12)


def test_now_in_block(spark):
    assert _one(spark, "nowInBlock()") is not None
