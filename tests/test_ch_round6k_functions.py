"""Round-6k mop-up tranche: everyday aliases and small utilities."""

from __future__ import annotations

import pytest

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql):
    df = spark.createDataFrame([(1,)], "id int")
    return run_ch_query(f"{sql} FROM t", {"t": df}).collect()[0][0]


def test_split_by_whitespace_and_non_alpha(spark):
    # tab/newline inputs ride a DataFrame column: the dialect's
    # string literals keep backslashes verbatim
    df = spark.createDataFrame([("a  b\tc",)], "s string")
    got = run_ch_query(
        "SELECT splitByWhitespace(s) AS r FROM t", {"t": df}
    ).collect()[0].r
    assert got == ["a", "b", "c"]
    assert _one(
        spark, "SELECT splitByNonAlpha('a-b,c 12x') AS r"
    ) == ["a", "b", "c", "12x"]
    assert _one(spark, "SELECT tokens('foo:bar baz9') AS r") == [
        "foo", "bar", "baz9",
    ]


def test_first_line(spark):
    df = spark.createDataFrame([("ab\ncd\nef",)], "s string")
    got = run_ch_query(
        "SELECT firstLine(s) AS r FROM t", {"t": df}
    ).collect()[0].r
    assert got == "ab"
    assert _one(spark, "SELECT firstLine('single') AS r") == "single"


def test_utf8_aliases(spark):
    assert _one(spark, "SELECT startsWithUTF8('héllo', 'hé') AS r")
    assert _one(spark, "SELECT endsWithUTF8('héllo', 'lo') AS r")
    assert _one(spark, "SELECT leftUTF8('héllo', 2) AS r") == "hé"
    assert _one(spark, "SELECT rightUTF8('héllo', 2) AS r") == "lo"
    assert _one(spark, "SELECT toValidUTF8('ok') AS r") == "ok"


def test_substring_index(spark):
    assert (
        _one(spark, "SELECT substringIndex('www.example.com', '.', 2) AS r")
        == "www.example"
    )
    assert (
        _one(spark, "SELECT substringIndex('www.example.com', '.', -1) AS r")
        == "com"
    )


def test_uuid_roundtrip(spark):
    u = "01234567-89ab-cdef-0123-456789abcdef"
    got = _one(
        spark,
        f"SELECT UUIDNumToString(UUIDStringToNum('{u}')) AS r",
    )
    assert got == u
    assert _one(spark, f"SELECT toUUIDOrNull('{u}') AS r") == u
    assert _one(spark, "SELECT toUUIDOrNull('nope') AS r") is None


def test_to_start_of_second_and_from_unixtime(spark):
    got = _one(
        spark,
        "SELECT toStartOfSecond(toDateTime('2024-03-10 12:37:44')) AS r",
    )
    assert got.strftime("%H:%M:%S") == "12:37:44"
    got = _one(spark, "SELECT FROM_UNIXTIME(0) AS r")
    assert got.strftime("%Y-%m-%d") == "1970-01-01"


def test_random_tail_distributions(spark):
    df = spark.createDataFrame([(i,) for i in range(4000)], "id int")
    rows = run_ch_query(
        "SELECT randCanonical() AS c, randExponential(2.0) AS e,"
        " randBernoulli(0.3) AS b FROM t",
        {"t": df},
    ).collect()
    cs = [r.c for r in rows]
    assert all(0 <= c < 1 for c in cs)
    assert 0.45 < sum(cs) / len(cs) < 0.55
    es = [r.e for r in rows]
    assert all(e >= 0 for e in es)
    assert 0.4 < sum(es) / len(es) < 0.6  # mean 1/lambda = 0.5
    bs = [r.b for r in rows]
    assert set(bs) <= {0, 1}
    assert 0.25 < sum(bs) / len(bs) < 0.35


def test_array_shuffle_and_sample(spark):
    got = _one(spark, "SELECT arrayShuffle([1,2,3,4,5]) AS r")
    assert sorted(got) == [1, 2, 3, 4, 5]
    got = _one(spark, "SELECT arrayRandomSample([1,2,3,4,5], 3) AS r")
    assert len(got) == 3 and set(got) <= {1, 2, 3, 4, 5}
    assert len(set(got)) == 3


def test_concat_assume_injective(spark):
    assert (
        _one(spark, "SELECT concatAssumeInjective('a', 'b', 'c') AS r")
        == "abc"
    )
