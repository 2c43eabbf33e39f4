"""Round-6b CH function tranche: the second coverage sweep's everyday
names — string search/replace (replaceOne, countSubstrings, hasToken,
multiSearchFirstIndex), calendar (toMonday/toWeek/timeSlots/
parseDateTimeBestEffort), integer math (gcd/lcm/bitTest/bitRotateLeft),
JSON introspection (JSONLength/JSONType/JSONExtractRaw), URL
(decodeURLComponent, cutToFirstSignificantSubdomain), map helpers
(mapApply, mapContainsKeyLike), and the ILIKE operator/function.
"""

from __future__ import annotations

import datetime

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (
                1,
                "hello world hello",
                '{"a": [1,2,3], "b": {"c": "x"}, "n": 7, "s": "t"}',
                "https://blog.example.co.uk/path?q=1",
            ),
            (2, "Apple pie", "[1,2]", "http://a.b.example.com/x"),
        ],
        "id int, s string, j string, u string",
    )


def _one(tdf, expr_sql, where="id = 1"):
    return run_ch_query(
        f"SELECT {expr_sql} AS x FROM t WHERE {where}", {"t": tdf}
    ).collect()[0].x


# ---------------------------------------------------------------- string


def test_replace_one(tdf):
    assert _one(tdf, "replaceOne(s, 'hello', 'hi')") == "hi world hello"
    assert _one(tdf, "replaceOne(s, 'zzz', 'hi')") == "hello world hello"


def test_replace_regexp_one(tdf):
    assert _one(tdf, "replaceRegexpOne(s, 'l+', 'L')") == "heLo world hello"
    assert _one(tdf, "replaceRegexpOne(s, 'q+', 'L')") == "hello world hello"


def test_count_substrings(tdf):
    assert _one(tdf, "countSubstrings(s, 'hello')") == 2
    assert _one(tdf, "countSubstrings(s, 'l')") == 5
    assert _one(tdf, "countSubstrings(s, '')") == 0
    # non-overlapping, left-to-right (CH scan)
    assert _one(tdf, "countSubstrings('aaaa', 'aa')") == 2


def test_count_matches(tdf):
    assert _one(tdf, "countMatches(s, 'l+')") == 3


def test_has_token(tdf):
    assert _one(tdf, "hasToken(s, 'world')") is True
    assert _one(tdf, "hasToken(s, 'worl')") is False
    assert _one(tdf, "hasToken('a,b,c', 'b')") is True


def test_multi_search_first_index(tdf):
    # leftmost match wins, not listing order
    assert _one(tdf, "multiSearchFirstIndex(s, ['xyz', 'world', 'hello'])") == 3
    assert _one(tdf, "multiSearchFirstIndex(s, ['world', 'zzz'])") == 1
    assert _one(tdf, "multiSearchFirstIndex(s, ['no', 'nope'])") == 0


def test_ngrams(tdf):
    assert _one(tdf, "ngrams('abcd', 2)") == ["ab", "bc", "cd"]
    assert _one(tdf, "ngrams('ab', 3)") == []


def test_normalize_query(tdf):
    assert (
        _one(tdf, "normalizeQuery('SELECT 12 AS x WHERE y = ''q''')")
        == "SELECT ? AS x WHERE y = ?"
    )
    assert _one(tdf, "normalizedQueryHash('SELECT 1')") == _one(
        tdf, "normalizedQueryHash('SELECT 2')"
    )


def test_utf8_aliases_and_ascii(tdf):
    assert _one(tdf, "lengthUTF8(s)") == 17
    assert _one(tdf, "substringUTF8(s, 7, 5)") == "world"
    assert _one(tdf, "ascii('A')") == 65


def test_to_fixed_string(tdf):
    assert _one(tdf, "length(toFixedString('ab', 4))") == 4


def test_ilike(tdf):
    assert _one(tdf, "s ILIKE 'HELLO%'") is True
    assert _one(tdf, "s NOT ILIKE 'HELLO%'") is False
    assert _one(tdf, "s ILIKE 'apple%'", where="id = 2") is True
    assert _one(tdf, "ilike(s, 'APPLE%')", where="id = 2") is True
    assert _one(tdf, "notILike(s, 'APPLE%')", where="id = 2") is False


# -------------------------------------------------------------- calendar


def test_to_monday(tdf):
    assert _one(tdf, "toMonday(toDate('2024-03-15'))") == datetime.date(
        2024, 3, 11
    )
    assert _one(tdf, "toMonday(toDate('2024-03-11'))") == datetime.date(
        2024, 3, 11
    )


def test_to_day_of_year_and_week(tdf):
    assert _one(tdf, "toDayOfYear(toDate('2024-03-15'))") == 75
    # 2024-01-07 is the first Sunday of 2024 -> week 1 in mode 0
    assert _one(tdf, "toWeek(toDate('2024-01-06'))") == 0
    assert _one(tdf, "toWeek(toDate('2024-01-07'))") == 1
    assert _one(tdf, "toWeek(toDate('2024-01-06'), 3)") == 1  # ISO


def test_time_slot_and_slots(tdf):
    got = _one(tdf, "timeSlot(toDateTime('2024-03-15 10:44:45'))")
    assert got == datetime.datetime(2024, 3, 15, 10, 30)
    slots = _one(tdf, "timeSlots(toDateTime('2024-03-15 10:44:45'), 3600)")
    assert slots[0] == datetime.datetime(2024, 3, 15, 10, 30)
    assert slots[-1] == datetime.datetime(2024, 3, 15, 11, 30)


def test_parse_best_effort(tdf):
    for s in (
        "2024-03-15 10:23:45",
        "2024-03-15T10:23:45",
        "15/03/2024 10:23:45",
        "20240315102345",
    ):
        assert _one(
            tdf, f"parseDateTimeBestEffort('{s}')"
        ) == datetime.datetime(2024, 3, 15, 10, 23, 45)
    # bare epoch digits
    assert _one(
        tdf, "parseDateTimeBestEffort('1710498225')"
    ) == datetime.datetime(2024, 3, 15, 10, 23, 45)


def test_parse_date_time(tdf):
    assert _one(
        tdf, "parseDateTime('15/03/2024', '%d/%m/%Y')"
    ) == datetime.datetime(2024, 3, 15)


def test_to_timezone(tdf):
    # session TZ is UTC; the wall-clock shifts to the target zone
    got = _one(
        tdf,
        "toTimeZone(toDateTime('2024-03-15 10:23:45'), 'America/New_York')",
    )
    assert got == datetime.datetime(2024, 3, 15, 6, 23, 45)


# ------------------------------------------------------------------ math


def test_gcd_lcm(tdf):
    assert _one(tdf, "gcd(12, 18)") == 6
    assert _one(tdf, "gcd(0, 5)") == 5
    assert _one(tdf, "gcd(-12, 18)") == 6
    assert _one(tdf, "lcm(4, 6)") == 12
    assert _one(tdf, "lcm(0, 6)") == 0


def test_max2_min2(tdf):
    assert _one(tdf, "max2(1, 2.5)") == 2.5
    assert _one(tdf, "min2(1, 2.5)") == 1.0


def test_bit_test_and_rotate(tdf):
    assert _one(tdf, "bitTest(5, 0)") == 1
    assert _one(tdf, "bitTest(5, 1)") == 0
    assert _one(tdf, "bitTest(5, 2)") == 1
    assert _one(tdf, "bitRotateLeft(1, 1)") == 2
    # the sign bit wraps around
    assert _one(tdf, "bitRotateLeft(1, 63)") == -(2**63)
    assert _one(tdf, "bitRotateLeft(7, 0)") == 7


def test_null_guards(tdf):
    assert _one(tdf, "isZeroOrNull(0)") is True
    assert _one(tdf, "isZeroOrNull(3)") is False
    assert _one(tdf, "ifNotFinite(toFloat64('Infinity'), -1)") == -1.0
    assert _one(tdf, "ifNotFinite(2.5, -1)") == 2.5
    assert _one(tdf, "toNullable(5)") == 5


# ---------------------------------------------------------------- arrays


def test_array_resize(tdf):
    assert _one(tdf, "arrayResize([1,2,3], 2)") == [1, 2]
    assert _one(tdf, "arrayResize([1,2], 4, 9)") == [1, 2, 9, 9]
    assert _one(tdf, "arrayResize([1,2], 4)") == [1, 2, None, None]


def test_array_product_and_enumerate_uniq(tdf):
    assert _one(tdf, "arrayProduct([2, 3, 4])") == 24.0
    assert _one(tdf, "arrayEnumerateUniq([10, 20, 10, 10])") == [1, 1, 2, 3]


# ------------------------------------------------------------------ JSON


def test_json_length(tdf):
    assert _one(tdf, "JSONLength(j, 'a')") == 3
    assert _one(tdf, "JSONLength(j)") == 4
    assert _one(tdf, "JSONLength(j)", where="id = 2") == 2


def test_json_type(tdf):
    assert _one(tdf, "JSONType(j)") == "Object"
    assert _one(tdf, "JSONType(j, 'a')") == "Array"
    assert _one(tdf, "JSONType(j, 'n')") == "Int64"
    assert _one(tdf, "JSONType(j, 's')") == "String"
    assert _one(tdf, "JSONType(j)", where="id = 2") == "Array"


def test_json_extract_raw(tdf):
    assert _one(tdf, "JSONExtractRaw(j, 'b')") == '{"c":"x"}'
    assert _one(tdf, "JSONExtractRaw(j, 'n')") == "7"
    assert _one(tdf, "JSONExtractRaw(j, 's')") == '"t"'


def test_simple_json(tdf):
    assert _one(tdf, "simpleJSONExtractString(j, 's')") == "t"
    assert _one(tdf, "visitParamExtractString(j, 's')") == "t"


# ------------------------------------------------------------------- URL


def test_url_codec(tdf):
    assert _one(tdf, "decodeURLComponent('a%20b')") == "a b"
    assert _one(tdf, "decodeURLComponent(encodeURLComponent('x y/z'))") == (
        "x y/z"
    )


def test_cut_to_first_significant_subdomain(tdf):
    assert _one(tdf, "cutToFirstSignificantSubdomain(u)") == "example.co.uk"
    assert (
        _one(tdf, "cutToFirstSignificantSubdomain(u)", where="id = 2")
        == "example.com"
    )
    assert (
        _one(tdf, "cutToFirstSignificantSubdomain('http://localhost/x')")
        == "localhost"
    )


# ------------------------------------------------------------------ maps


def test_map_apply(tdf):
    got = _one(tdf, "mapApply((k, v) -> tuple(concat(k, '!'), v * 2), map('a', 1, 'b', 2))")
    assert got == {"a!": 2, "b!": 4}


def test_map_contains_key_like(tdf):
    assert _one(tdf, "mapContainsKeyLike(map('abc', 1, 'xyz', 2), 'a%')") is True
    assert _one(tdf, "mapContainsKeyLike(map('abc', 1), 'q_c')") is False


# ------------------------------------------------------------------ misc


def test_uuid_string_to_num(tdf):
    got = _one(
        tdf, "UUIDStringToNum('00000000-0000-0000-0000-000000000001')"
    )
    assert got == b"\x00" * 15 + b"\x01"


def test_randomness_shapes(tdf):
    assert 0 <= _one(tdf, "rand()") < 2**32
    assert isinstance(_one(tdf, "rand64()"), int)
    assert 2.0 <= _one(tdf, "randUniform(2, 3)") < 3.0
    assert 0.0 <= _one(tdf, "randCanonical()") < 1.0
    assert isinstance(_one(tdf, "randNormal(10, 0.001)"), float)


def test_joda_syntax_variants(tdf):
    assert (
        _one(tdf, "formatDateTimeInJodaSyntax(toDateTime('2024-03-15 10:23:45'), 'yyyy/MM/dd HH:mm')")
        == "2024/03/15 10:23"
    )
    assert _one(
        tdf, "parseDateTimeInJodaSyntax('15|03|2024', 'dd|MM|yyyy')"
    ) == datetime.datetime(2024, 3, 15)
    assert _one(
        tdf, "parseDateTimeInJodaSyntaxOrNull('junk', 'dd|MM|yyyy')"
    ) is None
