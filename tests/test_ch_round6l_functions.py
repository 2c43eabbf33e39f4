"""Round-6l tranche: bitmap family (sorted-array carrier), SHA-2
variants, bit tests, breakpoint roundings, array tail."""

from __future__ import annotations

import hashlib

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql):
    df = spark.createDataFrame([(1,)], "id int")
    return run_ch_query(f"{sql} FROM t", {"t": df}).collect()[0][0]


def test_bitmap_set_algebra(spark):
    assert _one(
        spark, "SELECT bitmapToArray(bitmapBuild([3, 1, 3, 2])) AS r"
    ) == [1, 2, 3]
    assert _one(
        spark,
        "SELECT bitmapToArray(bitmapAnd(bitmapBuild([1,2,3]),"
        " bitmapBuild([2,3,4]))) AS r",
    ) == [2, 3]
    assert _one(
        spark,
        "SELECT bitmapToArray(bitmapOr(bitmapBuild([1,2]),"
        " bitmapBuild([2,9]))) AS r",
    ) == [1, 2, 9]
    assert _one(
        spark,
        "SELECT bitmapToArray(bitmapXor(bitmapBuild([1,2,3]),"
        " bitmapBuild([2,3,4]))) AS r",
    ) == [1, 4]
    assert _one(
        spark,
        "SELECT bitmapToArray(bitmapAndnot(bitmapBuild([1,2,3]),"
        " bitmapBuild([2]))) AS r",
    ) == [1, 3]


def test_bitmap_predicates_and_cardinality(spark):
    assert _one(
        spark, "SELECT bitmapCardinality(bitmapBuild([3,1,3])) AS r"
    ) == 2
    assert _one(
        spark, "SELECT bitmapContains(bitmapBuild([1,5]), 5) AS r"
    )
    assert _one(
        spark,
        "SELECT bitmapHasAny(bitmapBuild([1,2]), bitmapBuild([2,9]))"
        " AS r",
    )
    assert not _one(
        spark,
        "SELECT bitmapHasAll(bitmapBuild([1,2]), bitmapBuild([2,9]))"
        " AS r",
    )
    assert _one(
        spark,
        "SELECT bitmapAndCardinality(bitmapBuild([1,2,3]),"
        " bitmapBuild([2,3,9])) AS r",
    ) == 2
    assert _one(
        spark, "SELECT bitmapMin(bitmapBuild([5,2,9])) AS r"
    ) == 2


def test_sha2_variants(spark):
    for bits in (224, 384, 512):
        got = _one(spark, f"SELECT SHA{bits}('abc') AS r")
        want = getattr(hashlib, f"sha{bits}")(b"abc").hexdigest()
        assert got.lower() == want, bits


def test_bit_helpers(spark):
    # rotate right then left restores the value
    assert _one(
        spark, "SELECT bitRotateLeft(bitRotateRight(12345, 7), 7) AS r"
    ) == 12345
    assert _one(spark, "SELECT bitTestAny(5, 1, 2) AS r")   # bit 2 set
    assert not _one(spark, "SELECT bitTestAny(5, 1, 3) AS r")
    assert _one(spark, "SELECT bitTestAll(5, 0, 2) AS r")
    assert not _one(spark, "SELECT bitTestAll(5, 0, 1) AS r")


def test_array_cum_sum_non_negative(spark):
    assert _one(
        spark, "SELECT arrayCumSumNonNegative([1, 1, -4, 1]) AS r"
    ) == [1.0, 2.0, 0.0, 1.0]


def test_array_last_and_last_index(spark):
    assert _one(
        spark, "SELECT arrayLast(x -> x % 2 = 0, [1,2,3,4,5]) AS r"
    ) == 4
    assert _one(
        spark,
        "SELECT arrayLastIndex(x -> x % 2 = 0, [1,2,3,4,5]) AS r",
    ) == 4
    assert _one(
        spark, "SELECT arrayLastIndex(x -> x > 99, [1,2]) AS r"
    ) == 0


def test_breakpoint_roundings(spark):
    # the breakpoint tables from the CH documentation
    assert _one(spark, "SELECT roundDuration(230) AS r") == 180
    assert _one(spark, "SELECT roundDuration(0) AS r") == 0
    assert _one(spark, "SELECT roundDuration(40000) AS r") == 36000
    assert _one(spark, "SELECT roundAge(30) AS r") == 25
    assert _one(spark, "SELECT roundAge(0.5) AS r") == 0
    assert _one(spark, "SELECT roundAge(17) AS r") == 17
    assert _one(spark, "SELECT roundAge(60) AS r") == 55


def test_not_like_and_julian_or_null(spark):
    assert not _one(spark, "SELECT notLike('hello', 'he%') AS r")
    assert _one(spark, "SELECT notLike('hello', 'xx%') AS r")
    assert (
        _one(spark, "SELECT toModifiedJulianDayOrNull('2024-01-01') AS r")
        == 60310
    )
    assert (
        _one(spark, "SELECT toModifiedJulianDayOrNull('nope') AS r")
        is None
    )


def test_to_year_week(spark):
    assert _one(
        spark, "SELECT toYearWeek(toDate('2024-03-10')) AS r"
    ) == 202410


def test_to_year_week_boundaries(spark):
    # ISO-consistent at year boundaries: 2024-12-30 is week 1 of 2025
    assert _one(
        spark, "SELECT toYearWeek(toDate('2024-12-30')) AS r"
    ) == 202501
    # 2027-01-01 is ISO week 53 of 2026
    assert _one(
        spark, "SELECT toYearWeek(toDate('2027-01-01')) AS r"
    ) == 202653
    assert _one(
        spark, "SELECT toYearWeek(toDate('2024-06-15')) AS r"
    ) == 202424
