"""Round-7b tranche: the toRelative*Num bucket family (DateLUT
closed forms), fromModifiedJulianDay, clamp/toDecimalString, the
128/256-bit cast shims, byte/bit slicing, arrayShingles, ngramSearch,
and ULID/UUIDv7 timestamp extraction."""

from __future__ import annotations

import datetime

from baseline_magician_spark.plans.ch_sql import run_ch_query


def _one(spark, sql):
    t = spark.createDataFrame([(1,)], "i long")
    return run_ch_query(sql, {"t": t}).collect()[0].r


def test_relative_nums(spark):
    # toRelativeMonthNum('2002-05-07') = 2002*12 + 5 (CH DateLUT
    # keeps the +month asymmetry); quarter uses (month-1)/3
    assert _one(
        spark, "SELECT toRelativeMonthNum(toDate('2002-05-07')) AS r FROM t"
    ) == 24029
    assert _one(
        spark,
        "SELECT toRelativeQuarterNum(toDate('2002-05-07')) AS r FROM t",
    ) == 8009
    assert _one(
        spark, "SELECT toRelativeYearNum(toDate('2002-05-07')) AS r FROM t"
    ) == 2002


def test_relative_week_rolls_on_monday(spark):
    # 1970-01-01 was a Thursday: week 0 runs through Sunday 01-04,
    # week 1 begins Monday 01-05
    for d, want in [
        ("1970-01-01", 0),
        ("1970-01-04", 0),
        ("1970-01-05", 1),
        ("1970-01-11", 1),
        ("1970-01-12", 2),
    ]:
        got = _one(
            spark,
            f"SELECT toRelativeWeekNum(toDate('{d}')) AS r FROM t",
        )
        assert got == want, (d, got, want)


def test_relative_sub_day_nums(spark):
    assert _one(
        spark,
        "SELECT toRelativeHourNum("
        "toDateTime('1970-01-02 03:59:59')) AS r FROM t",
    ) == 27
    assert _one(
        spark,
        "SELECT toRelativeMinuteNum("
        "toDateTime('1970-01-01 00:02:30')) AS r FROM t",
    ) == 2
    assert _one(
        spark,
        "SELECT toRelativeSecondNum("
        "toDateTime('1970-01-01 00:00:42')) AS r FROM t",
    ) == 42


def test_from_modified_julian_day(spark):
    # inverse of the existing toModifiedJulianDay: MJD 58849 is
    # 2020-01-01; the OrNull form survives garbage
    assert _one(
        spark, "SELECT fromModifiedJulianDay(58849) AS r FROM t"
    ) == datetime.date(2020, 1, 1)
    assert _one(
        spark,
        "SELECT toModifiedJulianDay(fromModifiedJulianDay(0)) AS r FROM t",
    ) == 0
    assert _one(
        spark,
        "SELECT fromModifiedJulianDayOrNull(concat(toString(i), 'x')) "
        "AS r FROM t",
    ) is None


def test_clamp_and_decimal_string(spark):
    assert _one(spark, "SELECT clamp(7, 1, 5) AS r FROM t") == 5
    assert _one(spark, "SELECT clamp(-3, 1, 5) AS r FROM t") == 1
    assert _one(spark, "SELECT clamp(3, 1, 5) AS r FROM t") == 3
    assert _one(
        spark, "SELECT toDecimalString(2.5, 4) AS r FROM t"
    ) == "2.5000"
    assert _one(
        spark, "SELECT toDecimalString(64.32, 5) AS r FROM t"
    ) == "64.32000"


def test_int128_casts(spark):
    v = "-170141183460469231731687303715884105"
    assert _one(
        spark, f"SELECT toString(toInt128('{v}')) AS r FROM t"
    ) == v
    assert _one(
        spark,
        "SELECT toString(toUInt128('18446744073709551616')) AS r FROM t",
    ) == "18446744073709551616"  # 2^64: past UInt64, fine in 128


def test_byte_slice(spark):
    assert _one(
        spark, "SELECT byteSlice('hello world', 7, 5) AS r FROM t"
    ) == "world"
    assert _one(
        spark, "SELECT byteSlice('hello', -3, 2) AS r FROM t"
    ) == "ll"
    assert _one(
        spark, "SELECT byteSlice('hello world', 7) AS r FROM t"
    ) == "world"


def test_bit_slice(spark):
    # 'A' = 0x41 = 0100 0001 -> first 4 bits, right-padded: 0x40
    cases = [
        ("bitSlice('A', 1, 4)", "40"),
        # 'AB' = 0x41 0x42; bits 5..12 cross the byte boundary
        ("bitSlice('AB', 5, 8)", "14"),
        ("bitSlice('AB', 1)", "4142"),
        ("bitSlice('AB', -8)", "42"),  # negative offset: from end
        ("bitSlice('AB', 5, -4)", "14"),  # negative length: leave 4
        ("bitSlice('AB', 9, 0)", ""),  # empty slice
        ("bitSlice('AB', 1, 99)", "4142"),  # clamped to the string
    ]
    for expr, want in cases:
        got = _one(spark, f"SELECT hex({expr}) AS r FROM t")
        assert got == want, (expr, got, want)


def test_array_shingles(spark):
    assert _one(
        spark,
        "SELECT toString(arrayShingles([1,2,3,4], 3)) AS r FROM t",
    ) == "[[1, 2, 3], [2, 3, 4]]"
    assert _one(
        spark,
        "SELECT toString(arrayShingles([1,2], 3)) AS r FROM t",
    ) == "[]"
    assert _one(
        spark,
        "SELECT toString(arrayShingles(['a','b'], 1)) AS r FROM t",
    ) == "[[a], [b]]"


def test_ngram_search(spark):
    # every 4-gram of the needle is inside the haystack -> 1.0
    assert _one(
        spark,
        "SELECT ngramSearch('clickhouse engine', 'house') AS r FROM t",
    ) == 1.0
    assert _one(
        spark,
        "SELECT ngramSearch('abcdef', 'xyzw') AS r FROM t",
    ) == 0.0
    assert _one(
        spark,
        "SELECT ngramSearchCaseInsensitive('CLICKHOUSE', 'house') "
        "AS r FROM t",
    ) == 1.0
    # asymmetry vs the Dice-style distance: needle in haystack
    # scores full even when the haystack is much larger
    assert _one(
        spark,
        "SELECT ngramDistance('clickhouse engine', 'house') AS r FROM t",
    ) > 0.0


def test_ulid_uuid7_timestamps(spark):
    # decoded against an independent Crockford-base32 reference
    got = _one(
        spark,
        "SELECT toUnixTimestamp64Milli(ULIDStringToDateTime("
        "'01ARZ3NDEKTSV4RRFFQ69G5FAV')) AS r FROM t",
    )
    assert got == 1469922850259
    assert _one(
        spark,
        "SELECT ULIDStringToDateTime('not-a-ulid!') AS r FROM t",
    ) is None
    # UUIDv7: first 48 bits are unix-ms; version nibble gated
    got = _one(
        spark,
        "SELECT toUnixTimestamp64Milli(UUIDv7ToDateTime("
        "'018f05af-f7a9-778a-8f9b-123456789abc')) AS r FROM t",
    )
    assert got == 0x018F05AFF7A9
    assert _one(
        spark,
        "SELECT UUIDv7ToDateTime("
        "'018f05af-f7a9-478a-8f9b-123456789abc') AS r FROM t",
    ) is None  # version 4, not 7


def test_generate_ulid_shape(spark):
    rows = run_ch_query(
        "SELECT generateULID() AS u FROM t",
        {
            "t": spark.createDataFrame(
                [(i,) for i in range(8)], "i long"
            )
        },
    ).collect()
    alpha = set("0123456789ABCDEFGHJKMNPQRSTVWXYZ")
    seen = set()
    for r in rows:
        assert len(r.u) == 26
        assert set(r.u) <= alpha
        seen.add(r.u)
    assert len(seen) > 1  # random tail varies per row


def _b58_ref(data: bytes) -> str:
    """Independent reference encoder (classic big-int algorithm)."""
    alpha = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    n = int.from_bytes(data, "big")
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = alpha[r] + out
    return "1" * (len(data) - len(data.lstrip(b"\x00"))) + out


def test_base58_known_vectors(spark):
    cases = [
        ("Hello World!", "2NEpo7TZRRrLZSi2U"),
        ("The quick brown fox jumps over the lazy dog.",
         "USm3fpXnKG5EUBx2ndxBDMPVciP5hGey2Jh4NDv6gmeo1LkMeiKrLJUUBk6Z"),
        ("", ""),
    ]
    for raw, want in cases:
        assert _b58_ref(raw.encode()) == want  # reference sanity
        got = _one(spark, f"SELECT base58Encode('{raw}') AS r FROM t")
        assert got == want, (raw, got)


def test_base58_leading_zero_bytes(spark):
    # 0x0000287fb4cd -> '11233QC4' (the canonical leading-zeros vector)
    got = _one(
        spark,
        "SELECT base58Encode(unhex('0000287FB4CD')) AS r FROM t",
    )
    assert got == "11233QC4"
    got = _one(
        spark,
        "SELECT hex(base58Decode('11233QC4')) AS r FROM t",
    )
    assert got == "0000287FB4CD"


def test_base58_roundtrip_and_reference(spark):
    strs = [
        "a", "ab", "abc", "src7:12345", "x" * 24,
        "The quick brown fox", "0", "1", "zz9",
    ]
    sel = ", ".join(
        f"base58Encode('{s}') AS e{i}, "
        f"base58Decode(base58Encode('{s}')) AS d{i}"
        for i, s in enumerate(strs)
    )
    row = run_ch_query(
        f"SELECT {sel} FROM t",
        {"t": _spark_one(spark)},
    ).collect()[0]
    for i, s in enumerate(strs):
        assert row[f"e{i}"] == _b58_ref(s.encode()), s
        assert row[f"d{i}"] == s, s


def test_base58_decode_invalid_is_null(spark):
    for bad in ["0OIl", "abc!", "a b"]:
        assert _one(
            spark, f"SELECT tryBase58Decode('{bad}') AS r FROM t"
        ) is None


def _spark_one(spark):
    return spark.createDataFrame([(1,)], "i long")


def test_series_period_detect_fft(spark):
    # CH's documented example: [1,4,6] repeated -> period 3
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT([1,4,6,1,4,6,1,4,6,1,4,6,"
        "1,4,6,1,4,6,1,4,6]) AS r FROM t",
    ) == 3.0
    # sawtooth of period 5 over 60 points
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT(arrayMap(i -> toFloat64(i % 5),"
        " range(60))) AS r FROM t",
    ) == 5.0
    # guards: < 4 points, constant series
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT([1.0, 2.0, 3.0]) AS r FROM t",
    ) is None
    assert _one(
        spark,
        "SELECT seriesPeriodDetectFFT(arrayWithConstant(8, 2.0)) "
        "AS r FROM t",
    ) is None
